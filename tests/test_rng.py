"""RNG: bit-exactness vs the pure-python oracle, distribution sanity,
masked-advance semantics (raytracer_func.frag:90-135)."""
import numpy as np
import jax.numpy as jnp

from montecarlo_pathtracing_tpu.ops import rng


def test_xxhash32_matches_oracle():
    rs = np.random.RandomState(0)
    p = rs.randint(0, 2**32, size=(256, 3), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(rng.xxhash32(jnp.asarray(p)))
    want = np.array(
        [rng.xxhash32_py(int(x), int(y), int(z)) for x, y, z in p],
        dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_srand_matches_oracle():
    tc = np.array([[0.25, 0.75], [0.125, 0.5], [1.0, 0.0]], np.float32)
    for pass_index in (0, 1, 7, 1000):
        got = np.asarray(rng.srand(jnp.asarray(tc), pass_index, date=0.0))
        for i, (u, v) in enumerate(tc):
            want = rng.srand_py(float(u), float(v), pass_index, 0.0)
            np.testing.assert_array_equal(
                got[i].astype(np.uint64), np.asarray(want, np.uint64))


def test_uniform_stream_matches_oracle():
    tc = jnp.array([[0.3, 0.6]], jnp.float32)
    state = rng.srand(tc, 2)
    py_state = list(rng.srand_py(0.3, 0.6, 2))
    for _ in range(20):
        f, state = rng.uniform(state)
        fp, py_state = rng.uniform_py(py_state)
        assert float(f[0]) == float(fp)


def test_uniform_range_and_mean():
    tc = jnp.stack(
        [jnp.linspace(0.0, 1.0, 4096), jnp.linspace(1.0, 0.0, 4096)], -1)
    state = rng.srand(tc, 0)
    vals = []
    for _ in range(8):
        f, state = rng.uniform(state)
        vals.append(np.asarray(f))
    v = np.concatenate(vals)
    assert (v >= 0.0).all() and (v < 1.0).all()
    assert abs(v.mean() - 0.5) < 0.01
    assert abs(v.var() - 1.0 / 12.0) < 0.01


def test_srand_bit_stable_under_jit_and_traced_pass():
    """The determinism contract: identical counters eager vs jit vs traced
    pass index (the reference's float-math seed was 1-ulp unstable under
    XLA fusion — see ops/rng.py module docstring)."""
    import jax
    tc = jnp.array([[0.3, 0.7], [0.9, 0.1]], jnp.float32)
    for k in range(6):
        eager = np.asarray(rng.srand(tc, k))
        jit_traced = np.asarray(
            jax.jit(lambda t, p: rng.srand(t, p))(tc, jnp.int32(k)))
        jit_const = np.asarray(jax.jit(lambda t: rng.srand(t, k))(tc))
        np.testing.assert_array_equal(eager, jit_traced)
        np.testing.assert_array_equal(eager, jit_const)


def test_masked_advance_keeps_counters():
    tc = jnp.array([[0.1, 0.2], [0.3, 0.4]], jnp.float32)
    state = rng.srand(tc, 0)
    mask = jnp.array([True, False])
    _, s2 = rng.uniform_masked(state, mask)
    np.testing.assert_array_equal(
        np.asarray(s2[0]), np.asarray(state[0] + rng.ADVANCE))
    np.testing.assert_array_equal(np.asarray(s2[1]), np.asarray(state[1]))
    # the masked lane's NEXT draw equals what the unmasked draw would give
    f_direct, _ = rng.uniform(state)
    f_after, _ = rng.uniform(s2)
    assert float(f_after[1]) == float(f_direct[1])
