"""MXU-precision policy (sienerf_tpu/ops/exact.py): every jnp.einsum /
jnp.dot in the package must either set an explicit precision=, route
through exact_einsum, or carry a `# bf16-ok:` comment justifying default
(bf16) rounding.  Plus functional checks of the integer-routing paths with
payloads OUTSIDE the bf16-exact range (> 256), which the round-2 tests
missed — that gap let a bf16-corrupted-row-id frame ship (VERDICT r2
weak #1/#2).  CPU computes f32 natively so these pass regardless of the
hint; the on-TPU smoke lives in tools/tpu_smoke_baked.py."""

import re
from pathlib import Path

import jax.numpy as jnp
import numpy as np

PKG = Path(__file__).resolve().parent.parent / "sienerf_tpu"


def test_matmul_precision_policy():
    """Grep-audit (the policy is only enforceable mechanically: CPU tests
    cannot observe TPU matmul precision)."""
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if re.search(r"\bjnp\.(einsum|dot|matmul)\(", line) is None:
                continue
            # the call may span lines: scan forward to its closing paren
            window = "\n".join(lines[i : i + 8])
            context = "\n".join(lines[max(0, i - 3) : i + 1])
            if "precision=" in window or "bf16-ok" in context:
                continue
            offenders.append(f"{path.relative_to(PKG.parent)}:{i + 1}: {line.strip()}")
    assert not offenders, (
        "unguarded MXU contraction(s) — set precision= (see ops/exact.py) or "
        "justify with a '# bf16-ok:' comment:\n" + "\n".join(offenders)
    )


def test_exact_einsum_large_integers():
    from sienerf_tpu.ops.exact import exact_einsum

    ids = jnp.asarray([700001.0, 3.3e6, 257.0, 511.0])  # > bf16-exact range
    onehot = jnp.eye(4, dtype=jnp.float32)
    out = exact_einsum("ij,j->i", onehot, ids)
    assert np.array_equal(np.asarray(out), np.asarray(ids))


def test_lookup_bits_brick_large_row_ids():
    """Brick probe through a LARGE table (row ids far above bf16-exact
    range): chain dedup must return the same bits as the direct row probe."""
    from sienerf_tpu.ops.bits import (
        brick_probe_ids,
        lookup_bits_brick,
        pack_bits_brick,
    )

    K, X, Y, Z = 3, 129, 129, 129  # coarse sidecar dims at R=256
    rng = np.random.default_rng(11)
    n = K * X * Y * Z
    keep = rng.random(n) < 0.35
    words = pack_bits_brick(jnp.asarray(keep), (K, X, Y, Z))
    assert words.shape[0] > (1 << 14)  # ids demonstrably > bf16-exact range
    # chain-shaped probes biased toward the far (high-id) corner
    A, P = 64, 32
    o = rng.uniform(60, 125, (A, 1, 3))
    d = rng.normal(size=(A, 1, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = np.clip(o + d * np.arange(P)[None, :, None] * 0.7, 0, [X - 1, Y - 1, Z - 1])
    k3 = jnp.asarray(np.round(pts).astype(np.int32))
    casc = jnp.asarray(rng.integers(0, K, (A, 1)) * np.ones((1, P), np.int64), jnp.int32)
    row, off = brick_probe_ids(k3, casc, (K, X, Y, Z))
    got = np.asarray(lookup_bits_brick(words, row, off, n_heads=P))
    kk = np.asarray(casc)
    want = keep.reshape(K, X, Y, Z)[
        kk, np.asarray(k3)[..., 0], np.asarray(k3)[..., 1], np.asarray(k3)[..., 2]
    ]
    assert np.array_equal(got, want)


def test_baked_features_brick_large_row_ids():
    """Fine brick gather at R=64 x 3 cascades: brick row ids > 2^15; the
    deduped path must match the per-vertex row path byte-for-byte."""
    import jax

    from sienerf_tpu.ops.baked import (
        baked_features,
        baked_features_brick,
        pack_bricks_from_vertices,
    )

    R, K, F = 64, 3, 16
    Rv = R + 1
    n_vert = K * Rv**3
    key = jax.random.PRNGKey(5)
    vrows = jax.random.randint(key, (n_vert, F // 4), -(2**31), 2**31 - 1, jnp.int32)
    scale = jnp.abs(jax.random.normal(jax.random.PRNGKey(6), (K, F))) * 0.03 + 1e-3
    brows = pack_bricks_from_vertices(vrows, R, K, chunk=1 << 15)
    rng = np.random.default_rng(12)
    A, E = 32, 16
    o = rng.uniform(-1.2, 1.8, (A, 1, 3))
    d = rng.normal(size=(A, 1, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos = jnp.asarray(o + d * np.arange(E)[None, :, None] * 0.01, jnp.float32)
    feats_b, ovf = baked_features_brick(brows, scale, R, K, pos, n_heads=E)
    feats_r = baked_features(vrows, scale, R, K, "nearest", pos.reshape(-1, 3))
    fb = np.asarray(feats_b).reshape(-1, F)
    fr = np.asarray(feats_r)
    served = ~np.asarray(ovf).reshape(-1)
    assert served.sum() > A * E * 0.8
    assert np.array_equal(fb[served], fr[served])


def test_onehot_select_u32_exact():
    """Byte-plane one-hot routing must be bit-exact for arbitrary uint32
    payloads (floats bitcast through it too) in both directions."""
    import jax

    from sienerf_tpu.ops.exact import (
        onehot_compact_i32,
        onehot_compact_u32,
        onehot_select_u32,
    )

    A, P, S, W = 8, 24, 10, 4
    rng = np.random.default_rng(0)
    words = jnp.asarray(
        rng.integers(0, 1 << 32, (A, S, W), dtype=np.uint32)
    )  # full 32-bit range: exercises high bits and every byte plane
    slot = jax.random.randint(jax.random.PRNGKey(1), (A, P), 0, S, jnp.int32)
    sel = slot[..., None] == jnp.arange(S, dtype=jnp.int32)
    out = onehot_select_u32(sel, words)
    ref = np.take_along_axis(
        np.asarray(words), np.asarray(slot)[..., None], axis=1
    )
    assert np.array_equal(np.asarray(out), ref)

    # compact direction: one source per slot
    perm = jnp.argsort(jax.random.normal(jax.random.PRNGKey(2), (A, P)), axis=1)
    src = perm[:, :S]  # distinct source columns per slot
    selc = jnp.zeros((A, P, S), bool)
    selc = selc.at[jnp.arange(A)[:, None], src, jnp.arange(S)[None, :]].set(True)
    wordsP = jnp.asarray(rng.integers(0, 1 << 32, (A, P, W), dtype=np.uint32))
    outc = onehot_compact_u32(selc, wordsP)
    refc = np.take_along_axis(np.asarray(wordsP), np.asarray(src)[..., None], axis=1)
    assert np.array_equal(np.asarray(outc), refc)

    ids = jax.random.randint(jax.random.PRNGKey(4), (A, P), 0, (1 << 24), jnp.int32)
    outi = onehot_compact_i32(selc, ids)
    refi = np.take_along_axis(np.asarray(ids), np.asarray(src), axis=1)
    assert np.array_equal(np.asarray(outi), refi)
