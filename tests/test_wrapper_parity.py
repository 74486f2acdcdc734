"""Full-wrapper, full-shape numerical parity vs the upstream reference.

Extends the core-level parity test (test_reference_parity.py) to the
``RPEFlow`` wrapper at a realistic shape/aspect ratio — 288x480 images
(resize_to_64x upsamples them to 320x512, exercising the align_corners
resize), 4096-point clouds, IDS camera transform ON, losses and in-graph
metrics ON — the configuration where align_corners/padding/projection bugs
actually bite (reference models/RPEFlow.py:36-155).

Runs in two modes:
  * live (torch + /root/reference importable): jax params are exported with
    ``to_torch_state_dict``, the reference model runs the same inputs, and
    the outputs are both compared AND recorded to tests/fixtures/.
  * recorded: the committed fixture replays the torch outputs, so the test
    keeps guarding parity on machines without torch/reference. Inputs and
    params are regenerated deterministically (numpy RandomState / jax PRNG);
    if the model's parameter structure changes, re-record by deleting the
    fixture and running with torch available.
"""

import os
import sys

import numpy as np
import pytest

from rpeflow_tpu.train.config import ConfigNode

B, H, W, N = 1, 288, 480, 8192   # N=8192 = the FT3D train/eval cloud size
SAMPLES = (4096, 2048, 1024, 512, 256)  # wrapper-internal pyramid (fixed
# upstream: models/RPEFlow.py:74; the torch CPU FPS fallback additionally
# requires N > max(SAMPLES), wrapper.py:98)
BINS = 10

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "wrapper_parity_288x480.npz")

MODEL_CFG = ConfigNode({
    "ids": {"enabled": True, "sensor_size_divisor": 32},
    "freeze_bn": False,  # read unconditionally by the torch wrapper ctor
    # stored-but-inert upstream (RPEFlow_core.py:166-169 only stashes it);
    # required for constructing the torch reference at record time
    "attention": {"num_heads": 1, "ffn_expansion_factor": 2.66, "bias": False},
    "pwc2d": {
        "event_bins": BINS,
        "event_polarity": True,
        "norm": {"feature_pyramid": "batch_norm", "flow_estimator": None,
                 "context_network": None},
        "max_displacement": 4,
    },
    "pwc3d": {
        "norm": {"feature_pyramid": "batch_norm", "correlation": None,
                 "flow_estimator": None},
        "k": 16,
    },
    "loss2d": {"level_weights": [8, 4, 2, 1, 0.5], "order": "l2"},
    "loss3d": {"level_weights": [8, 4, 2, 1, 0.5], "order": "l2"},
})


def _inputs():
    """Deterministic synthetic batch (channels-last, jax layout)."""
    rng = np.random.RandomState(42)
    pc = rng.rand(B, N, 6).astype(np.float32) * 8 - 4
    pc[..., 2] = rng.rand(B, N) * 20 + 4.0
    pc[..., 5] = rng.rand(B, N) * 20 + 4.0
    flow2d = np.concatenate([
        rng.randn(B, H, W, 2).astype(np.float32) * 2,
        (rng.rand(B, H, W, 1) > 0.2).astype(np.float32)], axis=-1)
    flow3d = np.concatenate([
        rng.randn(B, N, 3).astype(np.float32) * 0.1,
        (rng.rand(B, N, 1) > 0.2).astype(np.float32)], axis=-1)
    return {
        "images": (rng.rand(B, H, W, 6) * 255).astype(np.float32),
        "pcs": pc,
        "event_voxel": rng.rand(B, H, W, 2 * BINS).astype(np.float32),
        "intrinsics": np.tile(
            np.array([[1050.0, (W - 1) / 2, (H - 1) / 2]], np.float32), (B, 1)),
        "flow_2d": flow2d,
        "flow_3d": flow3d,
    }


def _record_with_torch(variables, inputs):
    """Run the reference implementation on the same weights/inputs."""
    import torch

    sys.path.insert(0, "/root/reference")
    from test_reference_parity import _patch_mi_for_cpu

    _patch_mi_for_cpu()
    from models.RPEFlow import RPEFlow as TorchRPEFlow

    from rpeflow_tpu.compat.torch_loader import to_torch_state_dict

    torch_model = TorchRPEFlow(MODEL_CFG)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in to_torch_state_dict(variables).items()}
    torch_model.load_state_dict(sd, strict=True)
    torch_model.eval()

    t_inputs = {
        "images": torch.from_numpy(inputs["images"]).permute(0, 3, 1, 2),
        "pcs": torch.from_numpy(inputs["pcs"]).permute(0, 2, 1),
        "event_voxel": torch.from_numpy(
            inputs["event_voxel"]).permute(0, 3, 1, 2),
        "intrinsics": torch.from_numpy(inputs["intrinsics"]),
        "flow_2d": torch.from_numpy(inputs["flow_2d"]).permute(0, 3, 1, 2),
        "flow_3d": torch.from_numpy(inputs["flow_3d"]).permute(0, 2, 1),
    }
    with torch.no_grad():
        outputs = torch_model.forward(t_inputs, is_Train=True)
    summ = torch_model.get_scalar_summary()
    return {
        "flow_2d": outputs["flow_2d"].permute(0, 2, 3, 1).numpy(),
        "flow_3d": outputs["flow_3d"].permute(0, 2, 1).numpy(),
        "loss_2d": np.float32(float(summ["loss_2d"])),
        "loss_3d": np.float32(float(summ["loss_3d"])),
        "epe2d": np.float32(float(summ["epe2d"])),
        "epe3d": np.float32(float(summ["epe3d"])),
    }


@pytest.mark.reference_parity
@pytest.mark.slow
def test_wrapper_parity_fullshape():
    import jax

    from rpeflow_tpu.model import RPEFlow
    from rpeflow_tpu.model.rpeflow import flow_metrics

    inputs = _inputs()
    model = RPEFlow(cfgs=MODEL_CFG, n_samples_list=SAMPLES)
    # init with compute_mi=True so the MI-head params exist (torch builds
    # them unconditionally; strict load_state_dict requires every key) —
    # the eval-mode apply below never touches them
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.PRNGKey(0), "mi": jax.random.PRNGKey(1)},
            b, train=False, compute_mi=True, compute_loss=True)
    )(inputs)

    if os.path.exists(FIXTURE):
        ref = dict(np.load(FIXTURE))
    else:
        torch_spec = pytest.importorskip("torch")  # noqa: F841
        if not os.path.isdir("/root/reference"):
            pytest.skip("reference repo unavailable and no recorded fixture")
        ref = _record_with_torch(variables, inputs)
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez_compressed(FIXTURE, **ref)

    outputs, aux = model.apply(variables, inputs, train=False,
                               compute_mi=False, compute_loss=True)
    summ = aux["scalar_summary"]

    # Tolerance model: at full shape the 5-level decode accumulates ~1e-2 of
    # f32 sum-order noise, and a handful of points flip KNN/FPS ties
    # (equidistant neighbors round differently across frameworks; the IDS
    # inverse exp(log-depth) then amplifies those points). Measured: 2D
    # 0.12% of pixels beyond 5e-3 (max 0.013); 3D 0.15% of points beyond
    # 0.02 (max 0.91 at flow magnitude ~45). A real align_corners / layout
    # / projection bug shifts *every* element, so assert a quantile bound +
    # a mean bound instead of element-wise max. TPU additionally runs
    # convs/matmuls on the bf16 MXU.
    import jax as _jax
    atol = 5e-2 if _jax.default_backend() == "tpu" else 2e-2

    def assert_flow_close(actual, desired, msg):
        d = np.abs(np.asarray(actual) - desired)
        tol = atol + 1e-3 * np.abs(desired)
        frac_ok = float((d <= tol).mean())
        assert frac_ok >= 0.995, (
            f"{msg}: only {frac_ok:.4%} of elements within tolerance "
            f"(max |d| {d.max():.4f})")
        assert float(d.mean()) < atol, f"{msg}: mean |d| {d.mean():.5f}"

    assert_flow_close(outputs["flow_2d"], ref["flow_2d"],
                      "final 2D flow (full wrapper, 288x480)")
    assert_flow_close(outputs["flow_3d"], ref["flow_3d"],
                      "final 3D flow (full wrapper, 8192 pts)")
    np.testing.assert_allclose(float(summ["loss_2d"]), float(ref["loss_2d"]),
                               rtol=2e-3)
    np.testing.assert_allclose(float(summ["loss_3d"]), float(ref["loss_3d"]),
                               rtol=2e-3)
    np.testing.assert_allclose(float(summ["epe2d"]), float(ref["epe2d"]),
                               rtol=2e-3)
    np.testing.assert_allclose(float(summ["epe3d"]), float(ref["epe3d"]),
                               rtol=2e-3)


@pytest.mark.slow  # ~6.5 min cold on a 1-core host (full wrapper build x2)
def test_torch_state_dict_roundtrip():
    """to_torch_state_dict inverts convert_state_dict exactly."""
    import jax

    from rpeflow_tpu.compat.torch_loader import (
        assert_compatible,
        convert_state_dict,
        to_torch_state_dict,
    )
    from rpeflow_tpu.model import RPEFlow

    rng = np.random.RandomState(0)
    cfg = ConfigNode(MODEL_CFG.to_dict())
    cfg.pwc3d.k = 8
    model = RPEFlow(cfgs=cfg, n_samples_list=(32, 16, 8))
    tiny = {
        "images": (rng.rand(1, 64, 64, 6) * 255).astype(np.float32),
        "pcs": np.abs(rng.rand(1, 64, 6).astype(np.float32)) + 2.0,
        "event_voxel": rng.rand(1, 64, 64, 2 * BINS).astype(np.float32),
        "intrinsics": np.array([[100.0, 31.5, 31.5]], np.float32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, tiny,
                           train=False, compute_mi=False, compute_loss=False)
    sd = to_torch_state_dict(variables)
    back = convert_state_dict(sd)
    assert_compatible(variables["params"], back["params"])
    assert_compatible(back["params"], variables["params"])
    for (p1, a1), (p2, a2) in zip(
            sorted(_flatten_np(variables["params"]).items()),
            sorted(_flatten_np(back["params"]).items())):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a1), a2, err_msg=str(p1))
    if "batch_stats" in variables:
        assert_compatible(variables["batch_stats"], back["batch_stats"])


def _flatten_np(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten_np(v, prefix + "/" + k))
        else:
            out[prefix + "/" + k] = v
    return out
