"""Integration: the five BASELINE.json validation configs as fixtures.

SURVEY.md §4 mandates config regression — "the five BASELINE.json `configs`
become integration fixtures". examples/configs.py scales each config down
automatically off-TPU (the conftest pins an 8-device CPU platform), so these
run the full public-API path of every config: oracle check (1), CSG mix (2),
gradient fit (3), animated no-recompile edits (4), sharded 64-primitive
render + distributed fit step (5).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from examples import configs  # noqa: E402


def _check_image(img):
    img = np.asarray(img)
    assert img.ndim == 3 and img.shape[2] == 3
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # something visible was rendered


def test_config1_sphere_plane_oracle(capsys):
    _check_image(configs.config1())
    out = capsys.readouterr().out
    # config1 prints its oracle check; enforce it here too.
    err = float(out.split("max abs err vs oracle (64^2):")[1].split()[0])
    assert err < 1e-3


def test_config2_csg_mix():
    _check_image(configs.config2())


def test_config3_fit_smooth_blend():
    res = configs.config3()  # returns the fit result, not an image
    # The fit must actually recover the perturbed parameters (truths are
    # cx=-0.5, k=0.4; the run starts at cx=-0.62, k=0.15).
    cx = float(np.asarray(res.arrays.leaf_params)[0, 4])
    assert abs(cx - (-0.5)) < 0.1
    assert res.losses[-1] < res.losses[0] * 0.5


def test_config4_animated_runtime_edits(capsys):
    checks = configs.config4()  # returns per-frame means, not an image
    assert len(checks) == 24 and np.isfinite(checks).all()
    out = capsys.readouterr().out
    assert "one compiled program" in out


def test_config5_sharded_64_primitives(capsys):
    _check_image(configs.config5())
    out = capsys.readouterr().out
    assert "distributed fit step loss=" in out
