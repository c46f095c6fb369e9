"""Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from case_rg_tpu.kernels.additive_attention import (HAVE_PALLAS,
                                                    _scores_xla,
                                                    additive_scores)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_additive_scores_interpret_matches_xla():
    rng = np.random.RandomState(0)
    b, t, l, h = 2, 5, 37, 16   # deliberately non-tile-aligned t and l
    wq = jnp.asarray(rng.randn(b, t, h), jnp.float32)
    uh = jnp.asarray(rng.randn(b, l, h), jnp.float32)
    v = jnp.asarray(rng.randn(h), jnp.float32)
    ref = _scores_xla(wq, uh, v)
    out = additive_scores(wq, uh, v, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_additive_scores_grad_matches_xla():
    rng = np.random.RandomState(1)
    b, t, l, h = 1, 3, 9, 8
    wq = jnp.asarray(rng.randn(b, t, h), jnp.float32)
    uh = jnp.asarray(rng.randn(b, l, h), jnp.float32)
    v = jnp.asarray(rng.randn(h), jnp.float32)

    def f_pallas(wq, uh, v):
        return jnp.sum(additive_scores(wq, uh, v, True) ** 2)

    def f_xla(wq, uh, v):
        return jnp.sum(_scores_xla(wq, uh, v) ** 2)

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(wq, uh, v)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(wq, uh, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_single_query_mha_interpret_matches_xla():
    from case_rg_tpu.kernels.decode_attention import (single_query_mha,
                                                      single_query_mha_xla)
    rng = np.random.RandomState(2)
    b, l, e, h = 3, 700, 64, 4   # non-tile-aligned L
    q = jnp.asarray(rng.randn(b, 1, e), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, e), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, e), jnp.float32)
    keep = jnp.asarray(rng.rand(b, l) > 0.2)
    ref = single_query_mha_xla(q, k, v, keep, h)
    out = single_query_mha(q, k, v, keep, h, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # fully-masked row -> zeros, no NaN
    keep0 = keep.at[1].set(False)
    out0 = single_query_mha(q, k, v, keep0, h, True)
    assert np.isfinite(np.asarray(out0)).all()
    np.testing.assert_allclose(np.asarray(out0)[1], 0.0)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("r,lq,lk,e,h", [
    (6, 13, 17, 64, 8),        # non-tile-aligned, cross-shaped
    (4, 100, 100, 256, 8),     # passage encoder/tower site
    (2, 60, 60, 1280, 8),      # first tower block (5D wide, d=160)
])
def test_fused_mha_interpret_matches_xla(r, lq, lk, e, h):
    from case_rg_tpu.kernels.encoder_attention import fused_mha, fused_mha_xla
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(r, lq, e), jnp.float32)
    k = jnp.asarray(rng.randn(r, lk, e), jnp.float32)
    v = jnp.asarray(rng.randn(r, lk, e), jnp.float32)
    keep = jnp.asarray(rng.rand(r, lk) > 0.3)
    ref = fused_mha_xla(q, k, v, keep, h)
    out = fused_mha(q, k, v, keep, h, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)
    # fully-masked row -> zero context, no NaN (attend():90-91 semantics)
    keep0 = keep.at[0].set(False)
    out0 = np.asarray(fused_mha(q, k, v, keep0, h, True))
    assert np.isfinite(out0).all()
    np.testing.assert_allclose(out0[0], 0.0)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_fused_mha_no_mask_and_bf16():
    from case_rg_tpu.kernels.encoder_attention import fused_mha, fused_mha_xla
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(3, 10, 32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 12, 32), jnp.bfloat16)
    v = jnp.asarray(rng.randn(3, 12, 32), jnp.bfloat16)
    ref = np.asarray(fused_mha_xla(q, k, v, None, 4), np.float32)
    out = np.asarray(fused_mha(q, k, v, None, 4, True), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2)  # bf16 1-ULP


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("b,ls,hi", [
    (3, 60, 20),       # query-memory size, heavy duplication
    (4, 1060, 300),    # CaSE concat source (60 + 10x100)
    (2, 2000, 80),     # GLKS/GTTP background, extreme duplication
])
def test_combine_copy_mass_interpret_matches_xla(b, ls, hi):
    from case_rg_tpu.kernels.copy_argmax import (combine_copy_mass,
                                                 combine_copy_mass_xla)
    rng = np.random.RandomState(11)
    ids = rng.randint(0, hi, size=(b, ls)).astype(np.int32)
    ids[:, -ls // 8:] = 0                              # trailing PAD run
    cw = rng.rand(b, ls).astype(np.float32) * 0.01
    ref = np.asarray(combine_copy_mass_xla(jnp.asarray(cw), jnp.asarray(ids)))
    out = np.asarray(combine_copy_mass(jnp.asarray(cw), jnp.asarray(ids),
                                       True))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # group property: every member of a duplicate group carries the group sum
    gsum = np.zeros_like(cw[:, 0:1]).repeat(ls, 1)
    for bb in range(b):
        sums = {}
        for l in range(ls):
            sums[ids[bb, l]] = sums.get(ids[bb, l], 0.0) + cw[bb, l]
        for l in range(ls):
            gsum[bb, l] = sums[ids[bb, l]]
    np.testing.assert_allclose(out, gsum, atol=1e-4)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_combine_copy_mass_bf16_weights():
    from case_rg_tpu.kernels.copy_argmax import (combine_copy_mass,
                                                 combine_copy_mass_xla)
    rng = np.random.RandomState(12)
    ids = jnp.asarray(rng.randint(0, 40, size=(2, 130)), jnp.int32)
    cw = jnp.asarray(rng.rand(2, 130), jnp.bfloat16)
    ref = np.asarray(combine_copy_mass_xla(cw, ids))
    out = np.asarray(combine_copy_mass(cw, ids, True))
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, ref, atol=1e-2)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_combine_copy_mass_batch_sharded():
    """The combine's custom_partitioning rule must keep it runnable (and
    correct) inside a jitted program whose batch is sharded over the
    8-device mesh — the layout the serving/offline predict programs use
    (runtime/mesh.py). Per shard the plain single-device kernel runs on
    local rows (interpret mode on CPU)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from case_rg_tpu.kernels.copy_argmax import (combine_copy_mass,
                                                 combine_copy_mass_xla)
    devs = np.array(jax.devices())
    if devs.size < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(devs.reshape(devs.size), ("data",))
    rng = np.random.RandomState(13)
    b, ls = 2 * devs.size, 300
    ids = jnp.asarray(rng.randint(0, 60, size=(b, ls)), jnp.int32)
    cw = jnp.asarray(rng.rand(b, ls), jnp.float32) * 0.01
    ref = np.asarray(combine_copy_mass_xla(cw, ids))
    sh = NamedSharding(mesh, P("data", None))
    out = jax.jit(lambda c, i: combine_copy_mass(c, i, True))(
        jax.device_put(cw, sh), jax.device_put(ids, sh))
    assert out.sharding.is_equivalent_to(sh, 2)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_mha_rows_sharded(dtype):
    """fused_mha's custom_partitioning rule: rows-sharded jitted call on
    the 8-device mesh must equal the unsharded XLA reference. bf16 is the
    dtype the production gate (ops/attention._fused_attention_ok) routes
    to this kernel; f32 covers the rule itself at tight tolerance."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from case_rg_tpu.kernels.encoder_attention import fused_mha, fused_mha_xla
    devs = np.array(jax.devices())
    if devs.size < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(devs.reshape(devs.size), ("data",))
    rng = np.random.RandomState(14)
    r, l, e, h = 2 * devs.size, 24, 32, 4
    q = jnp.asarray(rng.standard_normal((r, l, e)), dtype)
    k = jnp.asarray(rng.standard_normal((r, l, e)), dtype)
    v = jnp.asarray(rng.standard_normal((r, l, e)), dtype)
    keep = jnp.asarray(rng.rand(r, l) > 0.2)
    keep = keep.at[:, 0].set(True)
    ref = np.asarray(fused_mha_xla(q, k, v, keep, h)).astype(np.float32)
    sh = NamedSharding(mesh, P("data", None, None))
    ksh = NamedSharding(mesh, P("data", None))
    out = jax.jit(lambda a, b, c, m: fused_mha(a, b, c, m, h, True))(
        jax.device_put(q, sh), jax.device_put(k, sh),
        jax.device_put(v, sh), jax.device_put(keep, ksh))
    assert out.dtype == dtype
    assert out.sharding.is_equivalent_to(sh, 3)
    np.testing.assert_allclose(np.asarray(out).astype(np.float32), ref,
                               atol=2e-5 if dtype == jnp.float32 else 2e-2)


@pytest.mark.parametrize("r,l,e,h", [(6, 12, 32, 4), (4, 10, 40, 8)])
def test_fused_train_mha_fwd_and_grads(r, l, e, h):
    _train_mha_case(r, l, l, e, h)


@pytest.mark.parametrize("r,lq,lk,e,h", [(4, 5, 18, 32, 4)])
def test_fused_train_mha_cross_attention(r, lq, lk, e, h):
    """Lq != Lk (the teacher-forced decoder cross-attention shape): the
    concatenated dq|dk|dv backward output slices correctly."""
    _train_mha_case(r, lq, lk, e, h)


def _train_mha_case(r, lq, lk, e, h):
    """Training attention kernel pair (kernels/train_attention.py):
    forward equals the einsum+dropout reference, and the custom-vjp
    backward (in-VMEM recompute, no stored probs) matches jax.grad of
    the reference to f32 tolerance — incl. an all-masked row."""
    import jax
    from case_rg_tpu.kernels.train_attention import (fused_train_mha,
                                                     fused_train_mha_xla)
    rate = 0.1
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.standard_normal((r, lq, e)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((r, lk, e)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((r, lk, e)), jnp.float32)
    keep = jnp.asarray(rng.rand(r, lk) > 0.2).at[min(2, r - 1)].set(False)
    mask = jnp.asarray((rng.rand(r, h, lq, lk) > rate).astype(np.float32))
    keepf = keep.astype(jnp.float32)[:, None, :]
    ref = fused_train_mha_xla(q, k, v, keep, mask, h, rate)
    out = fused_train_mha(q, k, v, keepf, mask, h, rate, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)

    gk = jax.grad(lambda *a: jnp.sum(jnp.sin(
        fused_train_mha(*a, keepf, mask, h, rate, True))),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(
        fused_train_mha_xla(*a, keep, mask, h, rate))),
        argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6,
                                   err_msg=f"d{name}")


def test_fused_train_mha_rows_sharded():
    """The rows custom_partitioning rule under value_and_grad: sharded
    loss + grads equal the unsharded reference on the 8-device mesh."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from case_rg_tpu.kernels.train_attention import (fused_train_mha,
                                                     fused_train_mha_xla)
    devs = np.array(jax.devices())
    if devs.size < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(devs.reshape(devs.size), ("data",))
    rate = 0.1
    rng = np.random.RandomState(9)
    r, l, e, h = 2 * devs.size, 16, 32, 4
    q, k, v = (jnp.asarray(rng.standard_normal((r, l, e)), jnp.float32)
               for _ in range(3))
    keep = jnp.asarray(rng.rand(r, l) > 0.2).at[:, 0].set(True)
    mask = jnp.asarray((rng.rand(r, h, l, l) > rate).astype(np.float32))
    keepf = keep.astype(jnp.float32)[:, None, :]

    def loss(q, k, v, keepf, mask):
        return jnp.sum(jnp.sin(fused_train_mha(q, k, v, keepf, mask, h,
                                               rate, True)))

    lr, gr = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v, keepf,
                                                         mask)
    sh3 = NamedSharding(mesh, P("data", None, None))
    sh4 = NamedSharding(mesh, P("data", None, None, None))
    ls, gs = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))(
        jax.device_put(q, sh3), jax.device_put(k, sh3),
        jax.device_put(v, sh3), jax.device_put(keepf, sh3),
        jax.device_put(mask, sh4))
    # cross-shard sum reassociation moves the scalar by ~1e-4 rel
    np.testing.assert_allclose(float(ls), float(lr), rtol=1e-3)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_fused_train_attention_end_to_end_grads():
    """The production gate (ops/attention._fused_train_attention_ok) via
    _FORCE_INTERPRET: a CaSE train loss + grads with the fused path must
    match the plain path (identical dropout mask stream — same make_rng
    key/shape — so the loss matches exactly up to kernel softmax
    rounding)."""
    import jax
    import case_rg_tpu.kernels.train_attention as ta
    from case_rg_tpu.config import ModelConfig
    from case_rg_tpu.models import create_model
    from case_rg_tpu.ops.attention import set_fused_train_attention

    V = 60
    cfg = ModelConfig(name="case", vocab_size=V, embedding_size=8,
                      hidden_size=8, num_heads=2, enc_layers=1,
                      dec_layers=1, max_dec_len=5, max_target_length=5)
    model = create_model("case", cfg)
    rng = np.random.RandomState(5)
    b = 4
    batch = {
        "query": jnp.asarray(rng.randint(4, V, (b, 1, 6)), jnp.int32),
        "passage": jnp.asarray(rng.randint(4, V, (b, 2, 8)), jnp.int32),
        "response": jnp.asarray(rng.randint(4, V, (b, 5)), jnp.int32),
        "passage_label": jnp.zeros((b,), jnp.int32),
        "token_label": jnp.asarray(
            (rng.rand(b, 2, 8) > .7).astype(np.float32)),
        "token_weight": jnp.ones((b, 2, 8), jnp.float32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, batch,
                           method=type(model).train_losses)

    def loss_fn(params, d_rng):
        losses = model.apply({"params": params}, batch,
                             deterministic=False, rngs={"dropout": d_rng},
                             method=type(model).train_losses)
        return sum(losses.values())

    def run(fta):
        set_fused_train_attention(fta)
        ta._FORCE_INTERPRET = fta
        try:
            l, g = jax.jit(jax.value_and_grad(loss_fn))(
                variables["params"], jax.random.PRNGKey(7))
            return float(l), jax.device_get(g)
        finally:
            set_fused_train_attention(False)
            ta._FORCE_INTERPRET = False

    bl, bg = run(False)
    fl, fg = run(True)
    assert abs(bl - fl) < 1e-5, (bl, fl)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(a, b_, atol=1e-4,
                                                 rtol=1e-4),
        bg, fg)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("r", [4, 16])   # r=16 > the rb cap of 8 ->
# multi-block grids: each block must seed from ITS global row0
def test_fused_train_mha_rng_consistency(r):
    """In-kernel-PRNG training attention (kernels/train_attention
    .fused_train_mha_rng): recover the kernel's actual dropout mask via
    the uniform-probs/basis-vectors probe, then require the kernel's fwd
    AND grads to equal the XLA reference evaluated WITH THAT MASK —
    proving the backward regenerates bit-identical bits (the custom_vjp
    contract). Real-TPU only: the Mosaic PRNG has no interpreter
    lowering on this image."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("fused_train_mha_rng needs a real TPU")
    import jax.numpy as jnp

    from case_rg_tpu.kernels.train_attention import (
        fused_train_mha_rng, fused_train_mha_xla, rng_meta_from_key)

    lq, lk, h, d = 8, 8, 2, 128
    e = h * d
    rate = 0.25
    key = jax.random.PRNGKey(11)
    meta = rng_meta_from_key(key, r)

    # --- mask recovery: q=0 -> uniform probs; v lanes = basis vectors
    # per head -> out[:, i, hd:hd+lk] = dropped-probs row i of head h
    v_probe = np.zeros((r, lk, e), np.float32)
    for hh in range(h):
        v_probe[:, :, hh * d:hh * d + lk] = np.eye(lk, dtype=np.float32)
    keepf = jnp.ones((r, 1, lk), jnp.float32)
    out = np.asarray(jax.device_get(fused_train_mha_rng(
        jnp.zeros((r, lq, e), jnp.float32), jnp.zeros((r, lk, e),
                                                      jnp.float32),
        jnp.asarray(v_probe), keepf, meta, h, rate)))
    mask = np.zeros((r, h, lq, lk), np.float32)
    for hh in range(h):
        pdrop = out[:, :, hh * d:hh * d + lk]       # [r, lq, lk]
        mask[:, hh] = (pdrop > 1e-9).astype(np.float32)
        # sanity: kept entries carry exactly uniform/keep_prob mass
        np.testing.assert_allclose(
            pdrop, mask[:, hh] * (1.0 / lk) / (1.0 - rate), atol=1e-6)
    frac = mask.mean()
    assert 0.5 < frac < 0.95, frac   # ~0.75 expected at rate 0.25

    # --- same seed, real inputs: kernel fwd+grads == XLA-with-that-mask
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.standard_normal((r, lq, e)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((r, lk, e)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((r, lk, e)).astype(np.float32))
    keep_rows = jnp.asarray((rng.rand(r, lk) > 0.2).astype(np.float32))
    keep_rows = keep_rows.at[:, 0].set(1.0)
    keepf2 = keep_rows[:, None, :]
    mask_j = jnp.asarray(mask)

    def f_kernel(q, k, v):
        return (fused_train_mha_rng(q, k, v, keepf2, meta, h, rate)
                .astype(jnp.float32).sum())

    def f_xla(q, k, v):
        return (fused_train_mha_xla(q, k, v, keep_rows > 0.5, mask_j, h,
                                    rate).astype(jnp.float32).sum())

    vk, gk = jax.value_and_grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    vx, gx = jax.value_and_grad(f_xla, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(vk), float(vx), rtol=2e-5)
    for a, b, nm in zip(gk, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=f"d{nm}")


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_fused_train_headbatch_equivalence():
    """The width-gated head-batched layout (ops/attention.py round 15)
    must produce the same context as the merged-head call for the same
    dropout key — the caller-mask kernel draws the [r, H, lq, lk] mask
    BEFORE the split, so the per-(row, head) stream is unchanged."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn  # noqa: F401

    from case_rg_tpu.kernels import train_attention as ta
    from case_rg_tpu.ops import attention as A
    from case_rg_tpu.ops.attention import MultiHeadAttention

    r, lq, lk, h, e = 2, 4, 4, 8, 1024   # e >= _HEADBATCH_MIN_E
    mha = MultiHeadAttention(num_heads=h, embed_dim=e, dropout=0.25)
    rng = np.random.RandomState(0)
    q_in = jnp.asarray(rng.standard_normal((r, lq, e)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((r, lk, e)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((r, lk, e)).astype(np.float32))
    variables = mha.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)},
                         q_in, k, v,
                         method=MultiHeadAttention.attend_with_kv)

    old_i = ta._FORCE_INTERPRET
    ta._FORCE_INTERPRET = True
    A.set_fused_train_attention(True)
    try:
        def run():
            out, _ = mha.apply(variables, q_in, k, v,
                               deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(7)},
                               method=MultiHeadAttention.attend_with_kv)
            return np.asarray(out)

        A.set_fused_train_headbatch(False)
        base = run()
        A.set_fused_train_headbatch(True)
        split = run()
    finally:
        ta._FORCE_INTERPRET = old_i
        A.set_fused_train_attention(False)
        A.set_fused_train_headbatch(True)
    np.testing.assert_allclose(split, base, rtol=2e-5, atol=2e-6)


def test_cast_params_fused_identity():
    """cast_params_fused == cast_params element-for-element (the round-15
    refuted-for-speed formulation must stay numerically identical)."""
    import jax.numpy as jnp

    from case_rg_tpu.train.precision import cast_params, cast_params_fused

    rng = np.random.RandomState(3)
    tree = {"a": jnp.asarray(rng.standard_normal((7, 5)).astype(np.float32)),
            "b": {"c": jnp.asarray(rng.standard_normal(11).astype(np.float32)),
                  "i": jnp.arange(4, dtype=jnp.int32)}}
    a = cast_params(tree)
    b = cast_params_fused(tree)
    np.testing.assert_array_equal(np.asarray(a["a"]), np.asarray(b["a"]))
    np.testing.assert_array_equal(np.asarray(a["b"]["c"]),
                                  np.asarray(b["b"]["c"]))
    assert b["b"]["i"].dtype == jnp.int32


def test_cast_params_grouped_identity():
    """cast_params_grouped == cast_params element-for-element, for plain
    dicts and FrozenDicts (structure preserved either way)."""
    import flax
    import jax
    import jax.numpy as jnp

    from case_rg_tpu.train.precision import cast_params, cast_params_grouped

    rng = np.random.RandomState(4)
    tree = {"enc": {"w": jnp.asarray(
                rng.standard_normal((7, 5)).astype(np.float32)),
                    "b": jnp.asarray(
                rng.standard_normal(11).astype(np.float32))},
            "dec": {"k": jnp.asarray(
                rng.standard_normal((3, 2)).astype(np.float32)),
                    "i": jnp.arange(4, dtype=jnp.int32)}}
    for t in (tree, flax.core.freeze(tree)):
        a, g = cast_params(t), cast_params_grouped(t)
        assert (jax.tree_util.tree_structure(a)
                == jax.tree_util.tree_structure(g))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(g)):
            assert x.dtype == y.dtype
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
