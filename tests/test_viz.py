"""Filmstrip rendering: geometry, dtype handling, and the archive CLI."""

import numpy as np
import pytest

from spatiotemporal_variable_separation_tpu.utils.viz import (
    _to_uint8_frames,
    save_strip,
    strip,
)


def test_to_uint8_handles_dtypes_and_channels():
    f = _to_uint8_frames(np.random.rand(4, 8, 8, 1).astype(np.float32))
    assert f.shape == (4, 8, 8, 3) and f.dtype == np.uint8
    u = _to_uint8_frames(np.zeros((2, 8, 8, 3), np.uint8))
    assert u.shape == (2, 8, 8, 3)
    two = _to_uint8_frames(np.random.rand(3, 8, 8, 2))  # taxibj in/out
    assert two.shape == (3, 8, 16, 3)
    constant = _to_uint8_frames(np.full((2, 4, 4, 1), 7.0))
    assert constant.max() == 0  # degenerate range must not divide by zero


def test_strip_geometry_mixed_lengths():
    rows = {"cond": np.random.rand(3, 16, 16, 1),
            "pred": np.random.rand(7, 16, 16, 1)}
    img = strip(rows, max_t=5, pad=2, label_px=8)
    # 2 rows x 16px + 3 pads; 8 gutter + 5 cols x 16 + 6 pads
    assert img.shape == (2 * 16 + 3 * 2, 8 + 5 * 16 + 6 * 2, 3)
    assert img.dtype == np.uint8


def test_save_strip_and_cli(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    p = tmp_path / "s.png"
    save_strip(str(p), {"a": np.random.rand(2, 8, 8, 1)}, scale=2)
    assert Image.open(p).size[1] > 8

    # CLI over a minimal archive layout
    rng = np.random.default_rng(0)
    np.savez_compressed(tmp_path / "predictions.npz",
                        predictions=(rng.random((5, 4, 8, 8, 1)) * 255).astype(np.uint8))
    np.savez_compressed(tmp_path / "gt.npz",
                        gt=(rng.random((5, 4, 8, 8, 1)) * 255).astype(np.uint8))
    np.savez_compressed(tmp_path / "results.npz",
                        mse=rng.random(5), psnr=rng.random(5), ssim=rng.random(5))
    from spatiotemporal_variable_separation_tpu.cli import visualize

    visualize.main(["--xp_dir", str(tmp_path), "--n", "3", "--rank", "spread"])
    out = sorted((tmp_path / "frames").iterdir())
    assert len(out) == 3 and out[0].suffix == ".png"


def test_cli_errors_without_archives(tmp_path):
    from spatiotemporal_variable_separation_tpu.cli import visualize

    with pytest.raises(FileNotFoundError):
        visualize.main(["--xp_dir", str(tmp_path)])
