"""Short training-TRAJECTORY differential vs the reference's executed
optimizer stack.

Runs the reference's own Trainer._train_it (tools/train_utils/
train_utils.py:128-138) with OptimWrapper(adam_onecycle) + OneCycle
(fastai_optim.py:101-233, learning_schedules_fastai.py:49-75) on CPU torch,
against our make_optimizer / TrainState.apply_gradients
(tpu3d/parallel/train_state.py) — same tiny Dense+BN+ReLU+Dense model,
same initial parameters (converted), same fixed batches, no randomness.
Per-step losses and the final parameters must track within float tolerance:
this is the one place a silent backward-pass or optimizer-semantics
divergence (true-wd scope, Adam betas, bias correction under a scheduled
beta1, grad-clip order) could hide.

This test pinned two real divergences when first written: our adamw ran
with optax's default b2=0.999 where the reference builds Adam with
betas=(0.9, 0.99) (train_rcnn.py:113), and our weight decay was masked to
kernels where the reference's bn_wd=True decays EVERY parameter group
(fastai_optim.py:133-147). Both fixed in make_optimizer.
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
torch = pytest.importorskip("torch")

import flax.linen as nn_flax
import jax.numpy as jnp
import torch.nn as tnn

from tpu3d.config import fresh_cfg
from tpu3d.models.pointnet2 import BatchNorm
from tpu3d.parallel.train_state import TrainState, make_optimizer

REF_TU = "/root/reference/pointrcnn/tools/train_utils"

N_STEPS = 12
TOTAL_STEPS = 40
IN_CH, HID = 8, 16
BATCH = 32


@pytest.fixture(scope="module")
def ref_mods():
    if not os.path.isdir(REF_TU):
        pytest.skip("reference repo not available")
    added_iterable = not hasattr(collections, "Iterable")
    if added_iterable:
        collections.Iterable = collections.abc.Iterable
    pkg = types.ModuleType("ref_tu")
    pkg.__path__ = [REF_TU]
    names = ["ref_tu"]
    sys.modules["ref_tu"] = pkg
    mods = {}
    for name in ("fastai_optim", "learning_schedules_fastai", "train_utils"):
        spec = importlib.util.spec_from_file_location(
            f"ref_tu.{name}", os.path.join(REF_TU, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_tu.{name}"] = mod
        names.append(f"ref_tu.{name}")
        spec.loader.exec_module(mod)
        mods[name] = mod
    yield mods
    for n in names:
        sys.modules.pop(n, None)
    if added_iterable:
        del collections.Iterable


class _TorchNet(tnn.Module):
    def __init__(self):
        super().__init__()
        # no bias under BN (matching SharedMLP's use_bias=not bn): a bias
        # feeding BatchNorm has an exactly-zero gradient, and Adam amplifies
        # the cross-framework numerical noise into an unbounded random walk
        self.fc1 = tnn.Linear(IN_CH, HID, bias=False)
        self.bn = tnn.BatchNorm1d(HID)
        self.fc2 = tnn.Linear(HID, 1)

    def forward(self, x):
        return self.fc2(torch.relu(self.bn(self.fc1(x))))


class _FlaxNet(nn_flax.Module):
    @nn_flax.compact
    def __call__(self, x, train: bool):
        x = nn_flax.Dense(HID, use_bias=False, name="fc1")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train,
                                 momentum=0.9)
        x = jax.nn.relu(x)
        return nn_flax.Dense(1, name="fc2")(x)


def _make_data(seed=0):
    rng = np.random.default_rng(seed)
    xs = rng.normal(size=(N_STEPS, BATCH, IN_CH)).astype(np.float32)
    ys = rng.normal(size=(N_STEPS, BATCH, 1)).astype(np.float32)
    return xs, ys


def _torch_trajectory(ref_mods, cfg):
    """The reference's executed loop: OneCycle.step(it) then
    Trainer._train_it (zero_grad -> loss.backward -> clip -> OptimWrapper
    step with true weight decay), exactly as train_utils.train drives it."""
    fastai_optim = ref_mods["fastai_optim"]
    ls = ref_mods["learning_schedules_fastai"]
    train_utils = ref_mods["train_utils"]
    torch.manual_seed(0)
    model = _TorchNet().double().float()
    xs, ys = _make_data()

    import functools

    import torch.optim as optim

    flatten = lambda m: (sum(map(flatten, m.children()), [])
                         if len(list(m.children())) else [m])
    layer_groups = [tnn.Sequential(*flatten(model))]
    optimizer = fastai_optim.OptimWrapper.create(
        functools.partial(optim.Adam, betas=(0.9, 0.99)), 3e-3,
        layer_groups, wd=cfg.TRAIN.WEIGHT_DECAY, true_wd=True, bn_wd=True)
    scheduler = ls.OneCycle(optimizer, TOTAL_STEPS, cfg.TRAIN.LR,
                            list(cfg.TRAIN.MOMS), cfg.TRAIN.DIV_FACTOR,
                            cfg.TRAIN.PCT_START)

    def model_fn(model, batch):
        x, y = batch
        pred = model(torch.from_numpy(x))
        loss = torch.mean((pred - torch.from_numpy(y)) ** 2)
        return loss, {}, {}

    trainer = types.SimpleNamespace(
        model=model, optimizer=optimizer, model_fn=model_fn,
        grad_norm_clip=cfg.TRAIN.GRAD_NORM_CLIP)

    losses = []
    for it in range(N_STEPS):
        scheduler.step(it)
        loss, _, _ = train_utils.Trainer._train_it(trainer, (xs[it], ys[it]))
        losses.append(loss)
    params = {k: v.detach().numpy().copy()
              for k, v in model.state_dict().items()}
    return np.asarray(losses), params


def _flax_trajectory(cfg, torch_params):
    model = _FlaxNet()
    xs, ys = _make_data()
    params = {
        "fc1": {"kernel": jnp.asarray(torch_params["fc1.weight"].T)},
        "fc2": {"kernel": jnp.asarray(torch_params["fc2.weight"].T),
                "bias": jnp.asarray(torch_params["fc2.bias"])},
        "bn": {"scale": jnp.ones(HID), "bias": jnp.zeros(HID)},
    }
    batch_stats = {"bn": {"mean": jnp.zeros(HID), "var": jnp.ones(HID)}}
    tx = make_optimizer(cfg, steps_per_epoch=TOTAL_STEPS, total_epochs=1,
                        params=params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params),
                       tx=tx)

    @jax.jit
    def train_step(state, x, y):
        def loss_fn(p):
            pred, mut = model.apply(
                {"params": p, "batch_stats": state.batch_stats}, x,
                train=True, mutable=["batch_stats"])
            return jnp.mean((pred - y) ** 2), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads, batch_stats=new_bs), loss

    losses = []
    for it in range(N_STEPS):
        state, loss = train_step(state, jnp.asarray(xs[it]),
                                 jnp.asarray(ys[it]))
        losses.append(float(loss))
    return np.asarray(losses), jax.device_get(state.params)


def test_training_trajectory_matches_reference(ref_mods):
    cfg = fresh_cfg()
    # the paper config's optimizer block (configs/default.yaml TRAIN)
    cfg.TRAIN.OPTIMIZER = "adam_onecycle"
    cfg.TRAIN.LR = 0.002
    cfg.TRAIN.WEIGHT_DECAY = 0.001
    cfg.TRAIN.MOMS = [0.95, 0.85]
    cfg.TRAIN.DIV_FACTOR = 10.0
    cfg.TRAIN.PCT_START = 0.4
    cfg.TRAIN.GRAD_NORM_CLIP = 1.0
    ref_losses, ref_params = _torch_trajectory(ref_mods, cfg)
    # init from the SAME torch weights (BN starts at ones/zeros both sides)
    our_losses, our_params = _flax_trajectory(cfg, ref_params_init(ref_mods))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-4, atol=2e-5)

    # final parameters: relative drift of every tensor within float-grade
    # tolerance of the reference's end state
    pairs = [
        (our_params["fc1"]["kernel"], ref_params["fc1.weight"].T),
        (our_params["fc2"]["kernel"], ref_params["fc2.weight"].T),
        (our_params["fc2"]["bias"], ref_params["fc2.bias"]),
        (our_params["bn"]["scale"], ref_params["bn.weight"]),
        (our_params["bn"]["bias"], ref_params["bn.bias"]),
    ]
    for ours, ref in pairs:
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3,
                                   atol=2e-4)


def ref_params_init(ref_mods):
    """The torch net's INITIAL parameters (re-seeded construction)."""
    torch.manual_seed(0)
    model = _TorchNet()
    return {k: v.detach().numpy().copy()
            for k, v in model.state_dict().items()}


@pytest.mark.parametrize("opt_name", ["adam", "sgd"])
def test_plain_optimizer_matches_torch(opt_name):
    """The non-onecycle branches (reference create_optimizer
    train_rcnn.py:98-102: plain torch Adam/SGD with L2-into-grad weight
    decay, torch default betas) — a plain Dense regression, no BN, fixed
    LR, vs torch.optim on identical init/batches."""
    import torch.optim as optim

    import optax  # noqa: F401  (built through make_optimizer)

    from tpu3d.config import fresh_cfg

    cfg = fresh_cfg()
    cfg.TRAIN.OPTIMIZER = opt_name
    cfg.TRAIN.LR = 0.01
    cfg.TRAIN.WEIGHT_DECAY = 0.01
    cfg.TRAIN.MOMENTUM = 0.9
    cfg.TRAIN.GRAD_NORM_CLIP = 1e9  # isolate the optimizer (no clipping)
    cfg.TRAIN.LR_WARMUP = False
    cfg.TRAIN.DECAY_STEP_LIST = [10**6]

    rng = np.random.default_rng(5)
    w0 = rng.normal(scale=0.4, size=(IN_CH, 1)).astype(np.float32)
    xs, ys = _make_data(seed=6)

    t_w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = (optim.Adam([t_w], lr=0.01, weight_decay=0.01)
            if opt_name == "adam"
            else optim.SGD([t_w], lr=0.01, weight_decay=0.01, momentum=0.9))
    for it in range(N_STEPS):
        topt.zero_grad()
        loss = torch.mean((torch.from_numpy(xs[it]) @ t_w
                           - torch.from_numpy(ys[it])) ** 2)
        loss.backward()
        topt.step()

    from tpu3d.parallel.train_state import make_optimizer

    params = {"w": jnp.asarray(w0)}
    tx = make_optimizer(cfg, steps_per_epoch=TOTAL_STEPS, total_epochs=1)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return jnp.mean((x @ p["w"] - y) ** 2)

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree_util.tree_map(lambda p, u: p + u, params, updates), \
            opt_state

    for it in range(N_STEPS):
        params, opt_state = step(params, opt_state, jnp.asarray(xs[it]),
                                 jnp.asarray(ys[it]))
    np.testing.assert_allclose(np.asarray(params["w"]),
                               t_w.detach().numpy(), rtol=1e-5, atol=1e-6)
