"""Golden-frame PSNR regression (BASELINE.json: per-frame PSNR >= 40 dB).

Compares fresh renders of the golden scenes against the committed PNGs.
Regenerate intentionally with `python tests/golden_scenes.py`.
"""

import os

import numpy as np
import pytest

from ash_tpu.utils.image import psnr, read_png

import golden_scenes


@pytest.mark.parametrize("name", sorted(golden_scenes.SCENES))
def test_golden_psnr(name):
    path = os.path.join(golden_scenes.GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated")
    golden = read_png(path)
    surface = golden_scenes.SCENES[name]()
    fresh = surface.read_back()
    value = psnr(fresh, golden)  # u8 inputs -> peak 255 by dtype
    assert value >= 40.0, f"{name}: PSNR {value:.1f} dB < 40 dB"
