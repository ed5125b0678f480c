"""Pallas ICM sweep kernel vs XLA formulation (interpret mode on CPU).

The kernel computes with bf16 tables; on integer-valued data every
intermediate is exactly representable in bf16, so the two paths must
agree bitwise. On Gaussian data bf16 rounding may flip rare near-ties,
so agreement is statistical."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def xla_sweeps(X, C, B, order, icmiter):
    from rayuela_tpu.ops.icm import _icm_sweeps
    from rayuela_tpu.ops.qerror import get_binaries, get_unaries
    m = C.shape[0]
    u = jnp.transpose(get_unaries(X, C), (1, 0, 2))
    Bin = get_binaries(C)
    Bin = Bin * (1.0 - jnp.eye(m))[:, :, None, None]
    T = jnp.transpose(Bin, (1, 0, 2, 3)).reshape(m, m * C.shape[1],
                                                 C.shape[1])
    return _icm_sweeps(u, T.astype(jnp.float32), B, order, icmiter)


def run_pallas(X, C, B, order, icmiter, chunk=64):
    from rayuela_tpu.ops.icm_pallas import icm_sweeps_pallas
    B, _ = icm_sweeps_pallas(X, C, B, order, icmiter, chunk=chunk,
                             interpret=True)
    return B


def test_energy_output_matches_mrf_energy(rng):
    """The kernel's emitted energy must equal the exact MRF energy of
    its output codes (bf16-exact integer data)."""
    from rayuela_tpu.ops.icm_pallas import icm_sweeps_pallas
    from rayuela_tpu.ops.qerror import veccost
    n, d, m, h = 200, 8, 4, 8
    X = jnp.asarray(rng.integers(-1, 2, (n, d)), jnp.float32)
    C = jnp.asarray(rng.integers(-1, 2, (m, h, d)), jnp.float32)
    B = jnp.asarray(rng.integers(0, h, (n, m)), jnp.int32)
    order = jnp.arange(m, dtype=jnp.int32)
    out, eng = icm_sweeps_pallas(X, C, B, order, 1, chunk=64,
                                 interpret=True)
    # E + |x|^2 == reconstruction cost
    expect = np.asarray(veccost(X, C, np.asarray(out))) - \
        (np.asarray(X) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(eng), expect, atol=1e-3)
    # icmiter=0 evaluates the energy of the INPUT codes
    _, eng0 = icm_sweeps_pallas(X, C, B, order, 0, chunk=64,
                                interpret=True)
    expect0 = np.asarray(veccost(X, C, np.asarray(B))) - \
        (np.asarray(X) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(eng0), expect0, atol=1e-3)


def test_exact_on_integer_data(rng):
    n, d, m, h = 300, 8, 4, 8
    X = jnp.asarray(rng.integers(-1, 2, (n, d)), jnp.float32)
    C = jnp.asarray(rng.integers(-1, 2, (m, h, d)), jnp.float32)
    B = jnp.asarray(rng.integers(0, h, (n, m)), jnp.int32)
    order = jnp.asarray([2, 0, 3, 1], jnp.int32)
    out_p = np.asarray(run_pallas(X, C, B, order, icmiter=2))
    out_x = np.asarray(xla_sweeps(X, C, B, order, 2))
    np.testing.assert_array_equal(out_p, out_x)


def test_statistical_on_gaussian(rng):
    n, d, m, h = 520, 16, 4, 8   # ragged vs chunk=64 too
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((m, h, d)) * 0.4, jnp.float32)
    B = jnp.asarray(rng.integers(0, h, (n, m)), jnp.int32)
    order = jnp.arange(m, dtype=jnp.int32)
    out_p = np.asarray(run_pallas(X, C, B, order, icmiter=2))
    out_x = np.asarray(xla_sweeps(X, C, B, order, 2))
    agree = (out_p == out_x).mean()
    assert agree > 0.98, f"agreement {agree}"
    assert out_p.shape == (n, m)


def test_improves_energy(rng):
    from rayuela_tpu.ops.qerror import veccost
    n, d, m, h = 200, 16, 4, 8
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((m, h, d)) * 0.4, jnp.float32)
    B = jnp.asarray(rng.integers(0, h, (n, m)), jnp.int32)
    order = jnp.arange(m, dtype=jnp.int32)
    out = run_pallas(X, C, B, order, icmiter=3)
    # ICM sweeps from a random start essentially always improve the
    # mean cost (per-vector monotone up to bf16 rounding)
    assert float(veccost(X, C, np.asarray(out)).mean()) < \
        float(veccost(X, C, np.asarray(B)).mean())


def test_availability_gate():
    from rayuela_tpu.ops.icm_pallas import pallas_icm_available
    # running-sum conditioning: state is linear in m, so the protocol
    # configs incl. the 128-bit m=15/16 ones are all VMEM-resident
    assert pallas_icm_available(8, 256, 128)
    assert pallas_icm_available(16, 256, 128)
    assert not pallas_icm_available(8, 100, 128)    # lane tiling
    assert not pallas_icm_available(64, 256, 128)   # VMEM


def test_full_ils_pallas_path(rng):
    """The Pallas-backed ILS encoder (interpret mode) honors the
    accept-if-better invariant and substantially improves codes."""
    import jax
    from rayuela_tpu.ops.icm import encoding_icm
    from rayuela_tpu.ops.qerror import veccost
    n, d, m, h = 300, 16, 4, 8
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((m, h, d)) * 0.4, jnp.float32)
    B0 = jnp.asarray(rng.integers(0, h, (n, m)), jnp.int32)
    B = encoding_icm(jax.random.PRNGKey(0), X, C, B0, ilsiter=3,
                     icmiter=2, npert=1, impl="pallas-interpret")
    c0 = np.asarray(veccost(X, C, B0))
    c1 = np.asarray(veccost(X, C, np.asarray(B)))
    assert (c1 <= c0 + 1e-3).all()
    assert c1.mean() < 0.7 * c0.mean()


def test_supported_covers_m16():
    from rayuela_tpu.ops.icm_pallas import pallas_icm_supported
    assert pallas_icm_supported(16, 256, 128)
    assert pallas_icm_supported(15, 256, 128)
    assert not pallas_icm_supported(16, 100, 128)   # lane tiling


def test_ils_kernel_accept_invariant_and_improvement(rng):
    """Single-launch ILS kernel: energies must be genuine bf16-model
    energies of the returned codes, rounds must never regress, and the
    result must substantially improve on the start."""
    from rayuela_tpu.ops.icm_pallas import encoding_ils_pallas
    from rayuela_tpu.ops.qerror import veccost
    n, d, m, h = 300, 16, 4, 8
    orders = jnp.asarray([np.random.default_rng(s).permutation(m)
                          for s in range(4)], jnp.int32)
    seed = jnp.asarray([[1234]], jnp.int32)

    # integer-valued data: every intermediate is bf16-exact, so the
    # emitted E must equal cost(B) - |x|^2 exactly
    Xi = jnp.asarray(rng.integers(-1, 2, (n, d)), jnp.float32)
    Ci = jnp.asarray(rng.integers(-1, 2, (m, h, d)), jnp.float32)
    B0 = jnp.asarray(rng.integers(0, h, (n, m)), jnp.int32)
    B, E = encoding_ils_pallas(Xi, Ci, B0, orders, seed, ilsiter=4,
                               icmiter=2, npert=1, chunk=64,
                               interpret=True)
    ci = np.asarray(veccost(Xi, Ci, np.asarray(B)))
    x2 = (np.asarray(Xi) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(E), ci - x2, atol=1e-3)

    # Gaussian data: accept-if-better invariant + real improvement
    # (comparisons happen in the bf16 energy model the kernel emits)
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((m, h, d)) * 0.4, jnp.float32)
    B, E = encoding_ils_pallas(X, C, B0, orders, seed, ilsiter=4,
                               icmiter=2, npert=1, chunk=64,
                               interpret=True)
    _, E0 = encoding_ils_pallas(X, C, B0, orders, seed, ilsiter=0,
                                icmiter=2, npert=1, chunk=64,
                                interpret=True)
    assert (np.asarray(E) <= np.asarray(E0) + 1e-4).all()
    c0 = np.asarray(veccost(X, C, np.asarray(B0)))
    c1 = np.asarray(veccost(X, C, np.asarray(B)))
    assert c1.mean() < 0.7 * c0.mean()


def test_ils_kernel_zero_rounds_keeps_input(rng):
    from rayuela_tpu.ops.icm_pallas import encoding_ils_pallas
    n, d, m, h = 100, 8, 4, 8
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((m, h, d)), jnp.float32)
    B0 = jnp.asarray(rng.integers(0, h, (n, m)), jnp.int32)
    orders = jnp.zeros((1, m), jnp.int32)
    B, _ = encoding_ils_pallas(X, C, B0, orders,
                               jnp.asarray([[7]], jnp.int32),
                               ilsiter=0, icmiter=1, npert=1, chunk=64,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(B), np.asarray(B0))


def test_ils_kernel_matches_relaunch_wrapper_quality(rng):
    """All three ILS backends (one-launch kernel, per-round relaunch,
    XLA) explore different random streams but must land at
    statistically equal quality."""
    import jax
    from rayuela_tpu.ops.icm import encoding_icm
    from rayuela_tpu.ops.qerror import veccost
    n, d, m, h = 400, 16, 4, 8
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((m, h, d)) * 0.4, jnp.float32)
    B0 = jnp.asarray(rng.integers(0, h, (n, m)), jnp.int32)
    kw = dict(ilsiter=4, icmiter=2, npert=1, randord=True)
    key = jax.random.PRNGKey(0)
    costs = []
    for impl in ("pallas-ils-interpret", "pallas-interpret", "xla"):
        B = encoding_icm(key, X, C, B0, impl=impl, **kw)
        costs.append(float(veccost(X, C, np.asarray(B)).mean()))
    ref = costs[-1]
    for c in costs[:-1]:
        assert abs(c - ref) / ref < 0.05, costs
