"""Good-Feature engine tests — mirrors the reference's test_Jacobian.cpp
(measurement Jacobian vs numeric differentiation) and test_Greedy.cpp
(lazier-greedy subset quality vs exhaustive greedy, stochastic regression)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gf_orb_slam_tpu.geometry import camera, linalg, quat, se3
from gf_orb_slam_tpu.gf import observability, selection


def synth_state_and_points(rng, cam, n=120):
    """EuRoC-intrinsics synthetic fixture (ref test_Greedy.cpp:81-194)."""
    Xv = np.zeros(13, np.float32)
    Xv[0:3] = rng.normal(size=3) * 0.3
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    q *= np.sign(q[0])
    Xv[3:7] = q * 0.0
    Xv[3] = 1.0  # identity-ish orientation, looking +z
    Xv[7:10] = rng.normal(size=3) * 0.2
    Xv[10:13] = rng.normal(size=3) * 0.1
    Xv = jnp.asarray(Xv)

    # Points in the frustum.
    uv = rng.uniform([40, 40], [cam.width - 40, cam.height - 40], size=(n, 2))
    z = rng.uniform(3.0, 15.0, size=n)
    xc = np.asarray(camera.backproject(cam, jnp.asarray(uv, jnp.float32), jnp.asarray(z, jnp.float32)))
    # world = R_wr xc + r  (camera orientation = identity here)
    pts = xc + np.asarray(Xv[0:3])
    return Xv, jnp.asarray(pts, jnp.float32)


class TestJacobians:
    def test_H_matches_autodiff(self, rng):
        """H13/H47 vs jax.jacfwd of the projection through the state — the
        reference's numeric-expectation test (test_Jacobian.cpp:236)."""
        cam = camera.EUROC_CAM
        Xv, pts = synth_state_and_points(rng, cam, n=10)
        # Give the state a non-trivial orientation.
        qr = np.asarray(quat.v2q(jnp.asarray([0.1, -0.2, 0.15])))
        Xv = Xv.at[3:7].set(jnp.asarray(qr))

        jac = observability.measurement_jacobians(cam, Xv, pts)

        def proj_of_state(state7, y):
            r, q = state7[:3], state7[3:7]
            R_rw = jnp.swapaxes(quat.q2r(q), -1, -2)
            hrl = R_rw @ (y - r)
            return jnp.stack(
                [cam.fx * hrl[0] / hrl[2] + cam.cx, cam.fy * hrl[1] / hrl[2] + cam.cy]
            )

        state7 = Xv[0:7]
        for i in range(10):
            J_num = np.asarray(jax.jacfwd(proj_of_state)(state7, pts[i]))
            np.testing.assert_allclose(np.asarray(jac.H[i]), J_num, rtol=2e-2, atol=2e-2)

    def test_visibility_gate(self, rng):
        cam = camera.EUROC_CAM
        Xv, pts = synth_state_and_points(rng, cam, n=50)
        behind = pts.at[:, 2].set(-5.0)  # all behind camera
        jac = observability.measurement_jacobians(cam, Xv, behind)
        assert not bool(jac.visible.any())

    def test_info_matrices_psd_and_rank(self, rng):
        cam = camera.EUROC_CAM
        Xv, pts = synth_state_and_points(rng, cam, n=60)
        jac = observability.measurement_jacobians(cam, Xv, pts)
        sigma2 = jnp.ones(60)
        blocks = observability.info_matrices(observability.whiten(jac.H, sigma2), jac.visible)
        B = np.asarray(blocks)
        # Each block PSD with rank ≤ 2.
        for i in range(10):
            ev = np.linalg.eigvalsh(B[i])
            assert ev.min() > -1e-5 * max(ev.max(), 1.0)  # PSD up to f32 roundoff
            assert (ev > 1e-6 * max(ev.max(), 1)).sum() <= 2
        # Sum over enough landmarks: observable in 6 dims. The 7th direction
        # (the quaternion scale gauge — projection is invariant to q → λq) is
        # null for EVERY landmark, which is why the selection objective adds
        # the 1e-5·I prior (ref Observability.cc:2861).
        total = B.sum(axis=0)
        ev = np.linalg.eigvalsh(total)
        assert ev[0] < 1e-3 * ev[1]  # the gauge direction
        assert ev[1] > 1e-2          # everything else observable

    def test_whitening_scales_info(self):
        H = jnp.ones((3, 2, 7))
        s2 = jnp.asarray([1.0, 4.0, 0.25])
        Hw = observability.whiten(H, s2)
        np.testing.assert_allclose(np.asarray(Hw[1]), 0.5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(Hw[2]), 2.0, atol=1e-6)


class TestSelection:
    def make_blocks(self, rng, cam, n=200):
        Xv, pts = synth_state_and_points(rng, cam, n=n)
        jac = observability.measurement_jacobians(cam, Xv, pts)
        oct_sigma2 = jnp.asarray(rng.choice([1.0, 1.44, 2.07, 2.99], size=n), jnp.float32)
        H_w = observability.whiten(jac.H, oct_sigma2)
        return observability.info_matrices(H_w, jac.visible), jac.visible

    def test_greedy_selects_k(self, rng):
        blocks, valid = self.make_blocks(rng, camera.EUROC_CAM)
        res = selection.greedy_maxlogdet(blocks, valid, k=60)
        assert int(res.n_selected) == 60
        assert np.isfinite(float(res.logdet))

    def test_greedy_beats_random(self, rng):
        """Greedy logdet must dominate random subsets of the same size."""
        blocks, valid = self.make_blocks(rng, camera.EUROC_CAM)
        k = 40
        res = selection.greedy_maxlogdet(blocks, valid, k=k)
        rand_lds = []
        for s in range(10):
            idx = rng.choice(np.nonzero(np.asarray(valid))[0], k, replace=False)
            M = selection.PRIOR_EPS * np.eye(7) + np.asarray(blocks)[idx].sum(axis=0)
            rand_lds.append(np.linalg.slogdet(M)[1])
        assert float(res.logdet) > max(rand_lds)

    def test_lazier_quality_regression(self, rng):
        """Reference test_Greedy.cpp:225-279: lazier greedy over many seeds
        stays within a small logdet degradation of exhaustive greedy and
        overlaps substantially in the chosen subset."""
        blocks, valid = self.make_blocks(rng, camera.EUROC_CAM)
        k = 60
        exact = selection.greedy_maxlogdet(blocks, valid, k=k)
        degr, overlaps = [], []
        for rep in range(20):
            res = selection.lazier_greedy_maxlogdet(
                blocks, valid, k=k, key=jax.random.PRNGKey(rep)
            )
            assert int(res.n_selected) == k
            degr.append(float(exact.logdet) - float(res.logdet))
            overlaps.append(
                (np.asarray(res.selected) & np.asarray(exact.selected)).sum() / k
            )
        assert np.mean(degr) < 0.5, (np.mean(degr), degr[:5])
        assert np.mean(overlaps) > 0.4, np.mean(overlaps)

    def test_batched_rounds_quality(self, rng):
        """batch>1 commits several picks per round (latency knob for the
        fused tracker); quality must stay near exact greedy and the count
        must land exactly on k even when batch does not divide k."""
        blocks, valid = self.make_blocks(rng, camera.EUROC_CAM)
        k = 60
        exact = selection.greedy_maxlogdet(blocks, valid, k=k)
        for batch in (5, 8, 7):
            degr = []
            for rep in range(5):
                res = selection.lazier_greedy_maxlogdet(
                    blocks, valid, k=k, key=jax.random.PRNGKey(100 + rep),
                    batch=batch,
                )
                assert int(res.n_selected) == k, (batch, int(res.n_selected))
                degr.append(float(exact.logdet) - float(res.logdet))
            assert np.mean(degr) < 1.5, (batch, np.mean(degr))

    def test_lowrank_matches_exact_greedy(self, rng):
        """The determinant-lemma kernel IS exact greedy — the same argmax
        sequence computed through logdet(I_r + F·cur⁻¹·Fᵀ) instead of
        per-candidate 7×7 Choleskys: identical selection at batch=1, and
        bounded degradation at the production batch size."""
        cam = camera.EUROC_CAM
        Xv, pts = synth_state_and_points(rng, cam, n=200)
        jac = observability.measurement_jacobians(cam, Xv, pts)
        H_w = observability.whiten(jac.H, jnp.ones(200))
        factors = jnp.where(jac.visible[:, None, None], H_w, 0.0)
        blocks = observability.info_matrices(H_w, jac.visible)
        k = 60
        exact = selection.greedy_maxlogdet(blocks, jac.visible, k=k)
        lr = selection.greedy_maxlogdet_lowrank(factors, jac.visible, k=k, batch=1)
        assert int(lr.n_selected) == k
        overlap = (np.asarray(lr.selected) & np.asarray(exact.selected)).sum()
        assert overlap >= k - 2, overlap  # fp tie-breaks only
        assert abs(float(lr.logdet) - float(exact.logdet)) < 1e-2
        lr5 = selection.greedy_maxlogdet_lowrank(factors, jac.visible, k=k, batch=5)
        assert int(lr5.n_selected) == k
        assert float(exact.logdet) - float(lr5.logdet) < 0.5
        # rank-4 hybrid factors go through the block-Schur closed form
        from gf_orb_slam_tpu.geometry import pwls

        F = pwls.f_matrix(Xv, jnp.asarray(0.05))
        fac4 = observability.hybrid_factors(H_w, F, jac.visible)
        hyb = observability.hybrid_matrices(H_w, F, jac.visible)
        e4 = selection.greedy_maxlogdet(hyb, jac.visible, k=k)
        l4 = selection.greedy_maxlogdet_lowrank(fac4, jac.visible, k=k, batch=1)
        assert abs(float(l4.logdet) - float(e4.logdet)) < 2e-2

    def test_lowrank_info_prior_complements(self, rng):
        """FRAME_MATCHING_INFO_PRIOR seeding (ref Tracking.h:91,
        Observability.cc:556-644): greedy seeded with the current matches'
        information must maximize the JOINT logdet(prior + picks) — at least
        as well as the prior-blind selection evaluated on the same joint
        objective."""
        cam = camera.EUROC_CAM
        Xv, pts = synth_state_and_points(rng, cam, n=200)
        jac = observability.measurement_jacobians(cam, Xv, pts)
        H_w = observability.whiten(jac.H, jnp.ones(200))
        factors = jnp.where(jac.visible[:, None, None], H_w, 0.0)
        blocks = np.asarray(observability.info_matrices(H_w, jac.visible))
        vis_idx = np.nonzero(np.asarray(jac.visible))[0]
        prior_idx = rng.choice(vis_idx, 40, replace=False)
        prior = jnp.asarray(blocks[prior_idx].sum(axis=0))
        cand = np.asarray(jac.visible).copy()
        cand[prior_idx] = False  # prior points are already matched
        k = 30
        with_p = selection.greedy_maxlogdet_lowrank(
            factors, jnp.asarray(cand), k=k, batch=1, info_prior=prior
        )
        blind = selection.greedy_maxlogdet_lowrank(
            factors, jnp.asarray(cand), k=k, batch=1
        )

        def joint(sel):
            M = (
                selection.PRIOR_EPS * np.eye(7)
                + np.asarray(prior)
                + blocks[np.asarray(sel)].sum(axis=0)
            )
            return np.linalg.slogdet(M)[1]

        assert joint(with_p.selected) >= joint(blind.selected) - 1e-3

    def test_auto_budget_stops_on_gain_floor(self, rng):
        """ref maxVolAutomatic_*: the budget is discovered from the marginal
        gain floor. A high floor must select fewer points than a low floor,
        never exceed k_max, and what it does select must be near-greedy
        quality at the same count."""
        blocks, valid = self.make_blocks(rng, camera.EUROC_CAM)
        key = jax.random.PRNGKey(7)
        res_lo = selection.auto_maxlogdet(blocks, valid, k_max=120, key=key, min_gain=0.01)
        res_hi = selection.auto_maxlogdet(blocks, valid, k_max=120, key=key, min_gain=0.8)
        n_lo, n_hi = int(res_lo.n_selected), int(res_hi.n_selected)
        assert 0 < n_hi < n_lo <= 120, (n_hi, n_lo)
        exact = selection.greedy_maxlogdet(blocks, valid, k=n_hi)
        assert float(exact.logdet) - float(res_hi.logdet) < 1.5

    def test_deletion_keeps_best(self, rng):
        blocks, valid = self.make_blocks(rng, camera.EUROC_CAM, n=100)
        res = selection.maxvol_deletion(blocks, valid, k_remove=40)
        n_valid = int(np.asarray(valid).sum())
        assert int(res.n_selected) == n_valid - 40
        # Surviving set should beat random survivors.
        rand = rng.choice(np.nonzero(np.asarray(valid))[0], n_valid - 40, replace=False)
        M = selection.PRIOR_EPS * np.eye(7) + np.asarray(blocks)[rand].sum(axis=0)
        assert float(res.logdet) >= np.linalg.slogdet(M)[1] - 1e-3

    def test_grouped_matches_lazier_quality(self, rng):
        blocks, valid = self.make_blocks(rng, camera.EUROC_CAM)
        k = 40
        exact = selection.greedy_maxlogdet(blocks, valid, k=k)
        res = selection.grouped_lazier_greedy(
            blocks, valid, k=k, key=jax.random.PRNGKey(0), n_shards=4
        )
        assert int(res.n_selected) == k
        # Sharding the pool trades some quality for parallelism (the reference's
        # multi-thread variant has the same property); bound the degradation.
        assert float(exact.logdet) - float(res.logdet) < 2.5

    def test_hybrid_blocks_shape_and_quality(self, rng):
        """13×13 [H; H·F] hybrid info blocks (ref Observability.cc:236-245,
        gf_mode='hybrid'): PSD rank ≤ 4, and Max-logDet selection over them
        keeps near-greedy CURRENT-pose quality while adding predicted-state
        information."""
        from gf_orb_slam_tpu.geometry import pwls

        cam = camera.EUROC_CAM
        Xv, pts = synth_state_and_points(rng, cam, n=200)
        jac = observability.measurement_jacobians(cam, Xv, pts)
        H_w = observability.whiten(jac.H, jnp.ones(200))
        F = pwls.f_matrix(Xv, jnp.asarray(0.05))
        hyb = observability.hybrid_matrices(H_w, F, jac.visible)
        assert hyb.shape == (200, 13, 13)
        B = np.asarray(hyb)
        for i in range(5):
            ev = np.linalg.eigvalsh(B[i])
            assert ev.min() > -1e-4 * max(ev.max(), 1.0)
            assert (ev > 1e-6 * max(ev.max(), 1)).sum() <= 4

        k = 60
        res_h = selection.lazier_greedy_maxlogdet(
            hyb, jac.visible, k=k, key=jax.random.PRNGKey(3)
        )
        assert int(res_h.n_selected) == k
        assert np.isfinite(float(res_h.logdet))
        # The hybrid objective optimizes the stacked two-segment metric, not
        # the 7×7 current-pose one (so it is NOT near 7×7-greedy); it must
        # still clearly beat random subsets on BOTH metrics.
        blocks7 = observability.info_matrices(H_w, jac.visible)
        sel = np.asarray(res_h.selected)
        M7 = selection.PRIOR_EPS * np.eye(7) + np.asarray(blocks7)[sel].sum(axis=0)
        ld7_h = np.linalg.slogdet(M7)[1]
        ld13_rand, ld7_rand = [], []
        for s in range(10):
            idx = rng.choice(np.nonzero(np.asarray(jac.visible))[0], k, replace=False)
            M13 = selection.PRIOR_EPS * np.eye(13) + B[idx].sum(axis=0)
            ld13_rand.append(np.linalg.slogdet(M13)[1])
            Mr = selection.PRIOR_EPS * np.eye(7) + np.asarray(blocks7)[idx].sum(axis=0)
            ld7_rand.append(np.linalg.slogdet(Mr)[1])
        assert float(res_h.logdet) > max(ld13_rand), "hybrid loses on its own metric"
        assert ld7_h > np.mean(ld7_rand), "hybrid subset weaker than random for pose"

    def test_octave_whitening_improves_selection(self, rng):
        """WITH_OCT_LEVELED_NOISE (ref reWeightInfoMat, Observability.h:517-
        570), wired as the production default in track_local_map: candidates
        carry octave-dependent measurement noise σ² = s^{2ℓ}; selection over
        correctly-whitened factors must achieve at least the TRUE information
        logdet of a selection that ignores the noise model (σ²=1), and beat it
        in aggregate when octaves are diverse."""
        cam = camera.EUROC_CAM
        s = 1.2
        margins = []
        for seed in range(6):
            r = np.random.default_rng(1000 + seed)
            Xv, pts = synth_state_and_points(r, cam, n=240)
            jac = observability.measurement_jacobians(cam, Xv, pts)
            octv = r.integers(0, 8, size=240)
            sigma2 = jnp.asarray(s ** (2.0 * octv), jnp.float32)
            H_true = observability.whiten(jac.H, sigma2)   # noise-correct
            fac_true = jnp.where(jac.visible[:, None, None], H_true, 0.0)
            fac_blind = jnp.where(jac.visible[:, None, None], jac.H, 0.0)
            k = 60
            sel_w = selection.greedy_maxlogdet_lowrank(
                fac_true, jac.visible, k=k, batch=1
            )
            sel_b = selection.greedy_maxlogdet_lowrank(
                fac_blind, jac.visible, k=k, batch=1
            )
            blocks_true = np.asarray(
                observability.info_matrices(H_true, jac.visible)
            )

            def true_logdet(mask):
                M = selection.PRIOR_EPS * np.eye(7) + blocks_true[
                    np.asarray(mask)
                ].sum(axis=0)
                return np.linalg.slogdet(M)[1]

            margins.append(true_logdet(sel_w.selected) - true_logdet(sel_b.selected))
        # Whitened selection optimizes the true objective directly: never
        # meaningfully worse per scene, strictly better on average.
        assert min(margins) > -0.15, margins
        assert np.mean(margins) > 0.1, margins

    def test_selection_handles_few_candidates(self, rng):
        """k larger than the candidate pool: select everything, no NaNs
        (ref: 'subset limit higher than input lmk number' path)."""
        blocks, valid = self.make_blocks(rng, camera.EUROC_CAM, n=30)
        res = selection.greedy_maxlogdet(blocks, valid, k=60)
        assert int(res.n_selected) == int(np.asarray(valid).sum())
        assert np.isfinite(float(res.logdet))
