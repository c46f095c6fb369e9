"""Driver-contract smoke test: multi-chip dry-run on the virtual CPU mesh."""

import jax


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    assert jax.device_count() == 8
    g.dryrun_multichip(8)
