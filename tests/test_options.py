"""Every accepted option must change output or cost when flipped
(VERDICT r2 item 6: no accepted-and-ignored knob anywhere).

Reference semantics: colourRestrict/alphaRestrict bar the COMBINED_ALPHA
modes 6/7 per block (amd_bc7_body.cpp:1312-1380); performance scales the
search effort at a given quality (amd_bc7_body.hpp:109-116); BC6H quality
maps to static search budgets.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gfx_imagecompress_tpu.kernels.bc7_full import encode_bc7_blocks


def _mode_of(words):
    """BC7 mode number per block from the low bits of word 0."""
    w0 = np.asarray(words)[:, 0]
    out = np.zeros(w0.shape, np.int32)
    for m in range(8):
        out[(w0 & ((1 << (m + 1)) - 1)) == (1 << m)] = m
    return out


def _gradient_blocks(n=8, seed=3, alpha=None):
    rng = np.random.default_rng(seed)
    base = rng.random((n, 1, 3), np.float32)
    d = rng.normal(0, 0.08, (n, 16, 3)).astype(np.float32)
    rgb = np.clip(base + np.cumsum(d, axis=1) * 0.2, 0, 1)
    a = np.ones((n, 16, 1), np.float32)
    if alpha is not None:
        a = alpha
    return jnp.asarray(np.concatenate([rgb, a], -1).astype(np.float32))


def test_colour_restrict_bars_mode6():
    # modes 1 + 6 only: on smooth opaque gradients mode 6 (7-bit + 4-bit
    # idx) beats mode 1 (6-bit + 3-bit idx), so the restriction visibly
    # changes the winner
    # pure linear ramps: mode 6's 16-level indices beat mode 1's 8 levels
    rng = np.random.default_rng(2)
    c0 = rng.random((8, 1, 3), np.float32) * 0.4
    c1 = c0 + 0.5
    t = np.linspace(0, 1, 16, dtype=np.float32)[None, :, None]
    rgb = c0 + t * (c1 - c0)
    a = np.ones((8, 16, 1), np.float32)
    b = jnp.asarray(np.concatenate([rgb, a], -1))
    wr, er = encode_bc7_blocks(b, quality=0.5, mode_mask=0x42,
                               colour_restrict=True)
    wu, eu = encode_bc7_blocks(b, quality=0.5, mode_mask=0x42,
                               colour_restrict=False)
    mr = _mode_of(wr)
    # opaque non-solid blocks must never use combined-alpha modes
    assert not np.any((mr == 6) | (mr == 7))
    # unrestricted search must be at least as good, and mode 6 must win
    # somewhere
    assert np.all(np.asarray(eu) <= np.asarray(er) + 1e-3)
    assert np.any(_mode_of(wu) == 6)


def test_alpha_restrict_bars_combined_on_punch_through():
    # colour+alpha correlated ramps whose alpha hits exact 0 and 1:
    # zero_one triggers, so alpha_restrict bars mode 6 in favour of the
    # separate-alpha mode 5
    rng = np.random.default_rng(2)
    c0 = rng.random((8, 1, 3), np.float32) * 0.4
    c1 = c0 + 0.5
    t = np.linspace(0, 1, 16, dtype=np.float32)[None, :, None]
    rgb = c0 + t * (c1 - c0)
    a = np.broadcast_to(t, (8, 16, 1)).astype(np.float32).copy()
    b = jnp.asarray(np.concatenate([rgb, a], -1))
    wr, _ = encode_bc7_blocks(b, quality=0.5, mode_mask=0x60,
                              alpha_restrict=True)
    wu, _ = encode_bc7_blocks(b, quality=0.5, mode_mask=0x60,
                              alpha_restrict=False)
    mr = _mode_of(wr)
    assert not np.any((mr == 6) | (mr == 7))
    assert np.any(_mode_of(wu) == 6)


def test_performance_scales_search_effort():
    b = _gradient_blocks(16, seed=7)
    wf, ef = encode_bc7_blocks(b, quality=0.75, performance=1.0)
    wp, ep = encode_bc7_blocks(b, quality=0.75, performance=0.3)
    # Reference semantics (r5 correction, measured on the bc7_full_p0.3
    # matrix row): performance < 1 routes high-range blocks to the
    # reference's OPTIMAL trace quantizer (amd_bc7_body.cpp:606-630), so
    # lower performance RAISES quality; the fw buys parity with a higher
    # budget tier + an extra top-k slot. The knob must change the output
    # and must not lose quality in aggregate.
    assert float(np.asarray(ep).sum()) <= float(np.asarray(ef).sum()) + 1e-3
    assert not np.array_equal(np.asarray(wf), np.asarray(wp))


def test_bc6h_options_quality_reaches_encoder():
    from gfx_imagecompress_tpu.api import compress_amd_bc6h
    from gfx_imagecompress_tpu.image import Image
    from gfx_imagecompress_tpu.options import BC6HOptions
    rng = np.random.default_rng(5)
    img = np.exp(rng.random((16, 16, 3), np.float32) * 3.0)
    src = Image(data=jnp.asarray(img[None]), hdr=True)
    hi = compress_amd_bc6h(src, options=BC6HOptions(quality=1.0))
    lo = compress_amd_bc6h(src, options=BC6HOptions(quality=0.3))
    assert not np.array_equal(np.asarray(hi.blocks), np.asarray(lo.blocks))


def test_b3d_refinement_joint_cube_changes_output():
    """b3d_refinement = the JOINT 3-channel jitter cube (Refine3D,
    amd_bcx_body.cpp:808-932), not extra sequential passes (VERDICT r2
    item 10: knob semantics must match the name)."""
    from gfx_imagecompress_tpu.kernels.bc1 import encode_bc1_blocks
    rng = np.random.default_rng(17)
    b = jnp.asarray(rng.random((64, 16, 3), np.float32))
    w1, e1 = encode_bc1_blocks(b, b3d_refinement=False)
    w2, e2 = encode_bc1_blocks(b, b3d_refinement=True)
    assert not np.array_equal(np.asarray(w1), np.asarray(w2))
    # the joint cube must not lose to the sequential pass in aggregate
    assert float(np.asarray(e2).sum()) <= float(np.asarray(e1).sum()) * 1.01
