"""Native library tests: threaded decode parity vs PIL, pose-graph solver
parity vs the JAX implementation."""

import os

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from packnet_sfm_tpu.native import (
    load_image_batch,
    load_native,
    native_available,
    solve_pose_graph_native,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    files = []
    for i, ext in enumerate(["png", "jpg", "png", "jpg"]):
        arr = (rng.uniform(size=(40, 56, 3)) * 255).astype(np.uint8)
        p = str(d / f"img{i}.{ext}")
        Image.fromarray(arr).save(p, quality=95)
        files.append((p, arr))
    return files


class TestImagePipeline:
    def test_thread_pool(self):
        lib = load_native()
        assert lib.pn_thread_count() >= 2

    def test_decode_resize_batch(self, image_files):
        paths = [p for p, _ in image_files]
        out = load_image_batch(paths, 40, 56)
        assert out.shape == (4, 40, 56, 3)
        assert out.dtype == np.float32
        # same-size "resize": compare against PIL's decode of the same file
        # (decoder parity; jpeg-of-noise differs hugely from the pre-encode
        # array, so the codec roundtrip is not the right oracle)
        for i, (p, _) in enumerate(image_files):
            ref = np.asarray(Image.open(p).convert("RGB")).astype(np.float32) / 255.0
            tol = 1e-6 if p.endswith("png") else 0.02
            assert np.abs(out[i] - ref).max() < tol, p

    def test_downscale_matches_area_mean(self, image_files):
        p, arr = image_files[0]  # png, exact decode
        out = load_image_batch([p], 20, 28)[0]
        ref = arr.astype(np.float32).reshape(20, 2, 28, 2, 3).mean((1, 3)) / 255.0
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_missing_file_raises(self):
        with pytest.raises(IOError):
            load_image_batch(["/nonexistent/x.png"], 8, 8)


class TestNativePoseGraph:
    def test_matches_jax_solver(self):
        from tests.test_egomotion import make_edges, make_trajectory
        from packnet_sfm_tpu.egomotion.posegraph import (
            PoseGraphConfig, chain_relative_poses, optimize_pose_graph)

        rng = np.random.default_rng(1)
        gt = make_trajectory(rng, 8)
        edges = make_edges(gt, rng, noise=0.02, loop=True)
        T_init = np.asarray(chain_relative_poses(edges["Z"][:7]))

        cfg = PoseGraphConfig(num_iterations=10, optimize_scales=True)
        T_jax, s_jax, c_jax = optimize_pose_graph(jnp.asarray(T_init), edges, cfg)
        T_nat, s_nat, c_nat = solve_pose_graph_native(
            T_init, {k: np.asarray(v) for k, v in edges.items()},
            num_iterations=10, optimize_scales=True)
        np.testing.assert_allclose(np.asarray(T_jax), T_nat, atol=5e-3)
        # f32-jacfwd vs f64-central-difference solvers converge along
        # slightly different paths in 10 iterations
        np.testing.assert_allclose(float(c_jax), c_nat, rtol=0.05)


class TestSingleDecode:
    def test_decode_image_parity_vs_pil(self, image_files):
        """datasets load_image's native fast path must decode identically to
        the PIL fallback (u8-exact for png, near for jpeg)."""
        from packnet_sfm_tpu.native import decode_image

        for p, _ in image_files:
            got = decode_image(p)
            assert got is not None and got.dtype == np.uint8
            ref = np.asarray(Image.open(p).convert("RGB"))
            assert got.shape == ref.shape
            tol = 0 if p.endswith("png") else 6
            assert np.abs(got.astype(int) - ref.astype(int)).max() <= tol, p

    def test_load_image_uses_native(self, image_files):
        from packnet_sfm_tpu.datasets.kitti import load_image

        p, _ = image_files[0]
        out = load_image(p)
        ref = np.asarray(Image.open(p).convert("RGB")).astype(np.float32) / 255
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_decode_image_grayscale_png(self, tmp_path):
        from packnet_sfm_tpu.native import decode_image

        arr = (np.random.default_rng(1).uniform(size=(16, 24)) * 255
               ).astype(np.uint8)
        p = str(tmp_path / "gray.png")
        Image.fromarray(arr, mode="L").save(p)
        got = decode_image(p)
        if got is None:
            pytest.skip("native lib unavailable")
        ref = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(got, ref)
