"""Driver-contract regression tests: __graft_entry__.entry() must stay
jittable single-chip and dryrun_multichip must compile + execute the sharded
global-BA step on the virtual 8-device mesh."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    pose, n_inl, logdet = jax.jit(fn)(*args)
    assert pose.shape == (7,)
    assert np.isfinite(np.asarray(pose)).all()
    assert int(n_inl) > 10, int(n_inl)
    assert np.isfinite(float(logdet))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
