"""Active matching tests: gain-greedy attempt semantics, budget accounting,
failed-attempt exclusion (ref runActiveMapMatching behavior)."""

import jax
import jax.numpy as jnp
import numpy as np

from gf_orb_slam_tpu.geometry import camera
from gf_orb_slam_tpu.gf import active_matching as am
from gf_orb_slam_tpu.gf import observability
from tests.test_gf import synth_state_and_points


def make_blocks(rng, n=150):
    cam = camera.EUROC_CAM
    Xv, pts = synth_state_and_points(rng, cam, n=n)
    jac = observability.measurement_jacobians(cam, Xv, pts)
    return observability.info_matrices(
        observability.whiten(jac.H, jnp.ones(n)), jac.visible
    ), jac.visible


class TestActiveMatch:
    def test_matches_up_to_budget(self, rng):
        blocks, valid = make_blocks(rng)
        n = blocks.shape[0]
        match_ok = jnp.ones(n, bool)
        res = am.active_match(
            blocks, valid, match_ok, jnp.arange(n, dtype=jnp.int32),
            jnp.zeros((7, 7)), budget=40, chunk=8,
        )
        assert int(res.n_matched) == 40
        assert int(res.n_attempted) == 40

    def test_failed_attempts_consume_budget(self, rng):
        """Candidates that fail to match burn budget — the anytime property."""
        blocks, valid = make_blocks(rng)
        n = blocks.shape[0]
        match_ok = jnp.zeros(n, bool).at[: n // 2].set(True)
        res = am.active_match(
            blocks, valid, match_ok, jnp.arange(n, dtype=jnp.int32),
            jnp.zeros((7, 7)), budget=40, chunk=8,
        )
        assert int(res.n_attempted) == 40
        assert int(res.n_matched) < 40           # some budget burned on failures
        matched = np.asarray(res.matched)
        assert not matched[n // 2 :].any()       # unmatchable never succeed

    def test_gain_greedy_beats_random_set(self, rng):
        from gf_orb_slam_tpu.geometry import linalg
        blocks, valid = make_blocks(rng, n=200)
        res = am.active_match(
            blocks, valid, jnp.ones(200, bool), jnp.arange(200, dtype=jnp.int32),
            jnp.zeros((7, 7)), budget=30, chunk=4,
        )
        ld = float(linalg.logdet_psd(res.info_total))
        v = np.nonzero(np.asarray(valid))[0]
        lds_rand = []
        for s in range(8):
            pick = rng.choice(v, 30, replace=False)
            M = 1e-5 * np.eye(7) + np.asarray(blocks)[pick].sum(axis=0)
            lds_rand.append(np.linalg.slogdet(M)[1])
        assert ld > max(lds_rand)

    def test_prior_info_shifts_selection(self, rng):
        """With a strong prior along some directions, active matching should
        prefer complementary candidates (submodularity)."""
        blocks, valid = make_blocks(rng, n=120)
        r0 = am.active_match(
            blocks, valid, jnp.ones(120, bool), jnp.arange(120, dtype=jnp.int32),
            jnp.zeros((7, 7)), budget=20, chunk=4,
        )
        # Prior = info of the first selection → second run should differ.
        r1 = am.active_match(
            blocks, valid, jnp.ones(120, bool), jnp.arange(120, dtype=jnp.int32),
            np.asarray(r0.info_total), budget=20, chunk=4,
        )
        overlap = (np.asarray(r0.matched) & np.asarray(r1.matched)).sum()
        assert overlap < 20  # not the identical set
