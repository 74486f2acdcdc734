"""Config system and checkpoint conversion/merging tests."""

import os

import numpy as np
import pytest

from rpeflow_tpu.compat.torch_loader import convert_state_dict
from rpeflow_tpu.train.checkpoint import merge_params
from rpeflow_tpu.train.config import ConfigNode, load_config

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "conf")


def test_config_attribute_access():
    cfg = ConfigNode({"a": {"b": 1, "c": [1, 2]}, "d": None})
    assert cfg.a.b == 1
    assert cfg.a.c == [1, 2]
    assert cfg.d is None
    assert "a" in cfg and hasattr(cfg, "a")
    assert not hasattr(cfg, "missing")
    assert cfg.get("missing", 5) == 5


def test_config_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  batch_size: 4\n  lr: 0.1\n")
    cfg = load_config(str(p), ["model.batch_size=16", "model.new.flag=true"])
    assert cfg.model.batch_size == 16
    assert cfg.model.new.flag is True


@pytest.mark.parametrize("name", [
    "train/pretrain.yaml", "train/ekubric.yaml", "train/dsec.yaml",
    "test/things.yaml", "test/ekubric.yaml", "test/dsec.yaml",
])
def test_shipped_configs_load(name):
    cfg = load_config(os.path.join(CONF_DIR, name))
    assert cfg.model.name == "RPEFlow"
    assert cfg.model.pwc2d.max_displacement == 4
    assert cfg.model.pwc3d.k == 16


@pytest.mark.parametrize("name", ["train/pretrain.yaml", "test/things.yaml"])
def test_reference_configs_load_unchanged(name):
    """The reference's own YAML files must load through our config system."""
    path = os.path.join("/root/reference/conf", name)
    cfg = load_config(path)
    assert cfg.model.name == "RPEFlow"
    assert cfg.model.ids.enabled is True


def test_convert_state_dict_rules():
    import torch

    sd = {
        "core.pyramid_convs.0.conv_fn.weight": torch.randn(8, 3, 3, 3),
        "core.pyramid_convs.0.conv_fn.bias": torch.randn(8),
        "core.pyramid_convs.0.norm_fn.weight": torch.randn(8),
        "core.pyramid_convs.0.norm_fn.bias": torch.randn(8),
        "core.pyramid_convs.0.norm_fn.running_mean": torch.randn(8),
        "core.pyramid_convs.0.norm_fn.running_var": torch.rand(8),
        "core.pyramid_convs.0.norm_fn.num_batches_tracked": torch.tensor(3),
        "core.linear.weight": torch.randn(16, 32),
        "core.attn.temperature": torch.ones(2, 1, 1),
        "core.fuse.norm1x.body.weight": torch.randn(8),
        "core.up_mask_head_2d.0.weight": torch.randn(256, 32, 3, 3),
        "core.conv1d.conv_fn.weight": torch.randn(16, 8, 1),
    }
    out = convert_state_dict(sd)
    p = out["params"]["core"]
    assert p["pyramid_convs_0"]["conv_fn"]["kernel"].shape == (3, 3, 3, 8)
    assert p["pyramid_convs_0"]["norm_fn"]["scale"].shape == (8,)
    assert out["batch_stats"]["core"]["pyramid_convs_0"]["norm_fn"]["mean"].shape == (8,)
    assert p["linear"]["kernel"].shape == (32, 16)
    assert p["attn"]["temperature"].shape == (2, 1, 1)
    assert p["fuse"]["norm1x"]["weight"].shape == (8,)
    assert (p["convex_upsampler"]["up_mask_head_2d"]["layers_0"]["kernel"].shape
            == (3, 3, 32, 256))
    assert p["conv1d"]["conv_fn"]["kernel"].shape == (1, 8, 16)
    assert "num_batches_tracked" not in str(out)


def test_merge_params_nonstrict():
    target = {"a": {"w": np.zeros((2, 2))}, "b": {"w": np.zeros((3,))}}
    source = {"a": {"w": np.ones((2, 2))}, "c": {"w": np.ones((5,))}}
    merged, skipped = merge_params(target, source, strict=False)
    np.testing.assert_array_equal(merged["a"]["w"], np.ones((2, 2)))
    np.testing.assert_array_equal(merged["b"]["w"], np.zeros((3,)))
    assert skipped == ["b/w"]

    with pytest.raises(ValueError):
        merge_params(target, source, strict=True)


def test_orbax_roundtrip(tmp_path):
    import jax.numpy as jnp
    import optax

    from rpeflow_tpu.train.checkpoint import CheckpointManager
    from rpeflow_tpu.train.state import TrainState, create_train_state

    tx = optax.adam(1e-3)
    variables = {"params": {"w": jnp.arange(4.0)}, "batch_stats": {"m": jnp.ones(2)}}
    state = create_train_state(variables, tx)
    state = state.replace(step=state.step + 5)

    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save("epoch-001", state, last_epoch=1, best_metrics={"outlier2d": 0.5})

    fresh = create_train_state(
        {"params": {"w": jnp.zeros(4)}, "batch_stats": {"m": jnp.zeros(2)}}, tx)
    restored, meta = mgr.restore("epoch-001", fresh)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.arange(4.0))
    assert int(restored.step) == 5
    assert meta["last_epoch"] == 1
    assert meta["best_metrics"]["outlier2d"] == 0.5


def test_torch_pt_checkpoint_roundtrip(tmp_path):
    """Full .pt file -> load_weights transfer, reference schema included."""
    import torch

    from rpeflow_tpu.train.checkpoint import load_weights

    sd = {
        "pwc_fusion_core.conv_last_2d.weight": torch.randn(2, 96, 3, 3),
        "pwc_fusion_core.conv_last_2d.bias": torch.randn(2),
    }
    path = str(tmp_path / "ref.pt")
    torch.save({"last_epoch": 7, "last_step": 123, "state_dict": sd,
                "best_metrics": {"outlier2d": 0.1}}, path)

    variables = {"params": {"pwc_fusion_core": {"conv_last_2d": {
        "kernel": np.zeros((3, 3, 96, 2), np.float32),
        "bias": np.zeros((2,), np.float32),
    }}}}
    out = load_weights(path, variables, strict=True)
    k = out["params"]["pwc_fusion_core"]["conv_last_2d"]["kernel"]
    np.testing.assert_allclose(
        k, sd["pwc_fusion_core.conv_last_2d.weight"].numpy().transpose(2, 3, 1, 0))

    # non-strict transfer with an extra model param succeeds
    variables["params"]["extra"] = {"w": np.zeros((4,), np.float32)}
    out = load_weights(path, variables, strict=False)
    assert out["params"]["extra"]["w"].shape == (4,)
