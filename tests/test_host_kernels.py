"""Host-kernel (offload-toggle CPU path) tests: the reference's ablation API
(KernelController) demands a working host implementation per stage and
consistent results across toggle settings (run_experiments.sh matrix)."""

import numpy as np
import pytest

from fasttrack_tpu import native
from fasttrack_tpu.datasets.synthetic import generate_sequence
from fasttrack_tpu.kernels import KernelConfig
from fasttrack_tpu.ops import OrbConfig
from fasttrack_tpu.ops import host_kernels as hk
from fasttrack_tpu.tracking import TrackingState

from tests.test_tracking_e2e import make_system

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native host library unavailable"
)


@pytest.fixture(scope="module")
def seq():
    return generate_sequence(n_frames=14, h=240, w=320, seed=3)


class TestHostExtraction:
    def test_pyramid_matches_device(self, seq):
        import jax.numpy as jnp

        from fasttrack_tpu.ops.pyramid import build_pyramid

        img = seq.frames[0].left
        cfg = OrbConfig(height=240, width=320, n_features=256, n_levels=4)
        raw, blur = hk.host_build_pyramid(img, cfg.pyramid)
        dev = build_pyramid(jnp.asarray(img, jnp.float32), cfg.pyramid)
        np.testing.assert_allclose(raw, np.asarray(dev.raw), atol=2e-2)
        np.testing.assert_allclose(blur, np.asarray(dev.blurred), atol=2e-2)

    def test_host_extraction_agrees_with_device(self, seq):
        """Host and device keypoints need not be identical (different
        selection heuristics, like the reference's CPU/GPU routes) but must
        substantially overlap and produce matchable descriptors."""
        import jax.numpy as jnp

        from fasttrack_tpu.ops.extractor import extract_orb

        img = seq.frames[0].left
        cfg = OrbConfig(height=240, width=320, n_features=256, n_levels=4)
        host = hk.host_extract_orb(img, cfg)
        kd, _ = extract_orb(jnp.asarray(img, jnp.float32), cfg)
        assert host.valid.sum() > 100
        # level-0 device keypoints: how many have a host keypoint within 2px?
        hx = np.stack([host.x[host.valid], host.y[host.valid]], -1)
        dx = np.stack([np.asarray(kd.x), np.asarray(kd.y)], -1)[np.asarray(kd.valid)]
        d2 = ((hx[:, None] - dx[None, :]) ** 2).sum(-1)
        frac = (d2.min(axis=1) < 4.0).mean()
        assert frac > 0.5, f"only {frac:.0%} of host kps near a device kp"

    def test_host_stereo_depth(self, seq):
        cfg = OrbConfig(height=240, width=320, n_features=256, n_levels=4)
        fr = seq.frames[0]
        kl, raw_l, _ = hk.host_extract_orb_with_pyramid(fr.left, cfg)
        kr, raw_r, _ = hk.host_extract_orb_with_pyramid(fr.right, cfg)
        scales = np.asarray([cfg.scale_factor**l for l in range(cfg.n_levels)],
                            np.float32)
        bf = seq.fx * seq.baseline
        u_right, depth = hk.host_match_rectified(
            kl, kr, raw_l, raw_r, scales, bf, seq.baseline
        )
        good = depth > 0
        assert good.sum() > 50
        # plane sits at ~plane_z from the camera: median depth in range
        med = np.median(depth[good])
        assert 2.0 < med < 8.0, med


class TestHostMatchers:
    def test_host_search_matches_device(self):
        rng = np.random.default_rng(0)
        M, N = 128, 256
        bits_q = rng.integers(0, 2, (M, 256)).astype(np.uint8)
        bits_k = rng.integers(0, 2, (N, 256)).astype(np.uint8)
        # make half the queries have an exact partner
        bits_k[:M // 2] = bits_q[:M // 2]
        pk_q = np.packbits(bits_q.reshape(M, 32, 8)[..., ::-1], -1).reshape(M, 32)
        pk_k = np.packbits(bits_k.reshape(N, 32, 8)[..., ::-1], -1).reshape(N, 32)
        q_uv = rng.uniform(0, 300, (M, 2)).astype(np.float32)
        kp_uv = np.concatenate([q_uv[:N // 2] if False else q_uv[:min(M, N)],
                                rng.uniform(0, 300, (max(N - M, 0), 2)).astype(np.float32)])
        kp_uv = kp_uv[:N]
        idx, dist, ok = hk.host_search_by_projection(
            q_uv, pk_q, np.full(M, 50.0, np.float32),
            np.zeros(M, np.int32), np.zeros(M, np.int32), np.ones(M, bool),
            kp_uv, pk_k, np.zeros(N, np.int32), np.ones(N, bool),
        )
        exact = idx[:M // 2] == np.arange(M // 2)
        assert exact.mean() > 0.9
        assert (dist[:M // 2][exact] == 0).all()


class TestToggleMatrixE2E:
    @pytest.mark.parametrize("mask", ["0000", "1000", "0100", "0011"])
    def test_tracking_survives_mode(self, seq, mask):
        """Each reference toggle bitmask (run_experiments.sh:15-25) must
        track the synthetic sequence; results agree across modes."""
        sys = make_system(seq)
        sys.tracker.kcfg = KernelConfig.from_bitmask(mask)
        for fr in seq.frames:
            sys.track_stereo(fr.left, fr.right, fr.timestamp)
        assert sys.tracking_state == TrackingState.OK, mask
        assert len(sys.tracker.trajectory) >= len(seq.frames) - 2
