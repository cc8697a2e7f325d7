"""Driver-hook tests: entry() compiles and dryrun_multichip runs on the CPU mesh."""

import jax
import numpy as np

import __graft_entry__ as graft


def test_entry_returns_jittable():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[1].shape[0], 384)
    assert bool(jax.numpy.isfinite(out).all())
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-2
    )


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)
