"""Bilateral aggregation vs naive oracle."""
import jax.numpy as jnp
import numpy as np

from localexpstereo_tpu.ops import bilateral


def test_bilateral_matches_naive():
    rng = np.random.default_rng(0)
    n, f, r, sigma = 2, 10, 3, 10.0
    p = rng.random((n, f, f)).astype(np.float32)
    guide = (rng.random((n, f, f, 3)) * 255).astype(np.float32)
    mask = np.ones((n, f, f), np.float32)
    mask[:, -2:] = 0.0  # emulate out-of-image rows

    got = np.asarray(bilateral.filter_windows(
        jnp.asarray(p), jnp.asarray(guide), jnp.asarray(mask), r, sigma))

    want = np.zeros_like(p)
    for i in range(n):
        for y in range(f):
            for x in range(f):
                num = den = 0.0
                for dy in range(-r, r + 1):
                    for dx in range(-r, r + 1):
                        qy, qx = y + dy, x + dx
                        if not (0 <= qy < f and 0 <= qx < f):
                            continue
                        if mask[i, qy, qx] == 0:
                            continue
                        w = np.exp(-np.abs(guide[i, qy, qx]
                                           - guide[i, y, x]).sum() / sigma)
                        num += w * p[i, qy, qx]
                        den += w
                want[i, y, x] = num / max(den, 1e-8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
