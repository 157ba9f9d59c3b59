"""Differential test vs the REFERENCE's own fastai OneCycle scheduler.

Executes tools/train_utils/learning_schedules_fastai.py (with its
fastai_optim sibling; `collections.Iterable` shimmed for py3.12) and drives
the reference's OneCycle + FakeOptim step by step, comparing the per-step LR
and momentum against our optax schedules (tpu3d/parallel/train_state.py
make_lr_schedule / make_momentum_schedule). The two implementations share
only the published recipe — cosine anneal lr_max/div -> lr_max -> lr_max/
(div*1e4) with a counter-cycled momentum — so agreement at every step is
reference-executed parity for the trainer's schedule leg
(learning_schedules_fastai.py:49-74).
"""

import collections
import collections.abc
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REF_TU = "/root/reference/pointrcnn/tools/train_utils"


@pytest.fixture(scope="module")
def ref_onecycle():
    if not os.path.isdir(REF_TU):
        pytest.skip("reference repo not available")
    # the 2019-era reference does `from collections import Iterable`
    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable
    pkg = types.ModuleType("ref_tu")
    pkg.__path__ = [REF_TU]
    sys.modules["ref_tu"] = pkg
    for name in ("fastai_optim", "learning_schedules_fastai"):
        spec = importlib.util.spec_from_file_location(
            f"ref_tu.{name}", os.path.join(REF_TU, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_tu.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ref_tu.learning_schedules_fastai"]


@pytest.mark.parametrize("lr_max,moms,div,pct", [
    (0.002, (0.9, 0.85), 10.0, 0.4),     # default.yaml TRAIN block
    (0.01, (0.95, 0.85), 30.0, 0.3),
])
def test_onecycle_matches_reference(ref_onecycle, lr_max, moms, div, pct):
    from tpu3d.config import fresh_cfg
    from tpu3d.parallel.train_state import (make_lr_schedule,
                                            make_momentum_schedule)

    steps_per_epoch, epochs = 10, 60
    total = steps_per_epoch * epochs
    opt = ref_onecycle.FakeOptim()
    sch = ref_onecycle.OneCycle(opt, total, lr_max, moms, div, pct)
    ref_lr, ref_mom = [], []
    for i in range(total):
        sch.step(i)
        ref_lr.append(opt.lr)
        ref_mom.append(opt.mom)

    cfg = fresh_cfg()
    cfg.TRAIN.OPTIMIZER = "adam_onecycle"
    cfg.TRAIN.LR = lr_max
    cfg.TRAIN.DIV_FACTOR = div
    cfg.TRAIN.PCT_START = pct
    cfg.TRAIN.MOMS = list(moms)
    lr_s = make_lr_schedule(cfg, steps_per_epoch, epochs)
    mom_s = make_momentum_schedule(cfg, steps_per_epoch, epochs)
    got_lr = np.array([float(lr_s(i)) for i in range(total)])
    got_mom = np.array([float(mom_s(i)) for i in range(total)])

    # f32 schedule eval vs the reference's f64 numpy: tiny rounding only
    np.testing.assert_allclose(got_lr, np.array(ref_lr), rtol=5e-4, atol=1e-9)
    np.testing.assert_allclose(got_mom, np.array(ref_mom), atol=1e-6)
    # the shape really is a cycle: peak at pct_start, ends ~lr_max/(div*1e4)
    assert abs(int(np.argmax(got_lr)) - int(total * pct)) <= 1
    assert got_lr[-1] < lr_max / (div * 1e3)
