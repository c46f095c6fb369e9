from .loops import run_beam, run_greedy, run_sample, tile_state
