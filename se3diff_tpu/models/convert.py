"""PyTorch-checkpoint -> flax parameter conversion for the DiG score model.

The public bioemu checkpoints are torch state dicts whose module names follow
`bioemu/src/bioemu/models.py` / `structure_module.py`; this maps them onto
:class:`se3diff_tpu.models.dig.DiGConditionalScoreModel`'s flax tree:

* torch ``nn.Linear.weight [out, in]`` -> flax ``kernel [in, out]`` (transpose)
* ``x1d_proj``/``x2d_proj`` Sequential(LayerNorm, Linear) -> split into
  ``{x}_ln`` (scale/bias) + ``{x}_proj`` (kernel)
* ``ffn.ff.0/.3`` -> ``ffn/fc1``/``ffn/fc2``
* ``diff_head.fc_{t,eps}.0/.1/.3`` (LN, Linear, [ReLU], Linear) ->
  ``fc_{t,eps}_ln`` / ``_fc1`` / ``_fc2``
* ``rp_proj.relative_attention_bias.weight`` (torch Embedding) -> flax
  ``Embed.embedding`` (no transpose)
* ``step_emb.dummy`` (fp16-detection sentinel) is dropped.

Verified bit-for-bit (atol 1e-5) against the reference's golden bundle
(`bioemu/tests/{state_dict.ptkeep,expected.npz}`) in tests/test_convert.py.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

# Linear submodules inside attention: weight is transposed into a kernel.
_ATTN_LINEARS = (
    "scalar_query",
    "scalar_key",
    "scalar_value",
    "point_query",
    "point_key",
    "point_value",
    "pair_bias",
    "pair_value",
    "fc_out",
)


def torch_state_dict_to_flax(sd: Mapping[str, np.ndarray]) -> dict:
    """Convert a bioemu DiGConditionalScoreModel state dict (as numpy arrays)
    into flax ``{"params": ...}`` variables."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    out: dict[str, Any] = {}

    def put(path: tuple[str, ...], value: np.ndarray) -> None:
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    n_layers = (
        max(
            (
                int(k.split(".")[4])
                for k in sd
                if k.startswith("model_nn.st_module.encoder.layers.")
            ),
            default=-1,
        )
        + 1
    )

    # Trunk projections: Sequential(LN, Linear).
    for name in ("x1d", "x2d"):
        put((f"{name}_ln", "scale"), sd[f"model_nn.{name}_proj.0.weight"])
        put((f"{name}_ln", "bias"), sd[f"model_nn.{name}_proj.0.bias"])
        put((f"{name}_proj", "kernel"), sd[f"model_nn.{name}_proj.1.weight"].T)

    put(
        ("rp_proj", "relative_attention_bias", "embedding"),
        sd["model_nn.rp_proj.relative_attention_bias.weight"],
    )

    for i in range(n_layers):
        tp = f"model_nn.st_module.encoder.layers.{i}"
        fp = ("st_module", f"layer_{i}")
        for norm in ("norm1", "norm2"):
            put(fp + (norm, "scale"), sd[f"{tp}.{norm}.weight"])
            put(fp + (norm, "bias"), sd[f"{tp}.{norm}.bias"])
        for lin in _ATTN_LINEARS:
            put(fp + ("attn", lin, "kernel"), sd[f"{tp}.attn.{lin}.weight"].T)
        put(fp + ("attn", "fc_out", "bias"), sd[f"{tp}.attn.fc_out.bias"])
        put(
            fp + ("attn", "trained_point_weight"),
            sd[f"{tp}.attn.trained_point_weight"],
        )
        for torch_idx, flax_name in (("0", "fc1"), ("3", "fc2")):
            put(fp + ("ffn", flax_name, "kernel"), sd[f"{tp}.ffn.ff.{torch_idx}.weight"].T)
            put(fp + ("ffn", flax_name, "bias"), sd[f"{tp}.ffn.ff.{torch_idx}.bias"])

    for head in ("fc_t", "fc_eps"):
        tp = f"model_nn.st_module.diff_head.{head}"
        fp = ("st_module", "diff_head")
        put(fp + (f"{head}_ln", "scale"), sd[f"{tp}.0.weight"])
        put(fp + (f"{head}_ln", "bias"), sd[f"{tp}.0.bias"])
        for torch_idx, flax_name in (("1", f"{head}_fc1"), ("3", f"{head}_fc2")):
            put(fp + (flax_name, "kernel"), sd[f"{tp}.{torch_idx}.weight"].T)
            put(fp + (flax_name, "bias"), sd[f"{tp}.{torch_idx}.bias"])

    return {"params": {"model_nn": out}}


def flax_to_torch_state_dict(variables: Mapping) -> dict[str, np.ndarray]:
    """Inverse mapping (for exporting checkpoints the reference stack loads)."""
    params = variables["params"]["model_nn"]
    sd: dict[str, np.ndarray] = {}

    for name in ("x1d", "x2d"):
        sd[f"model_nn.{name}_proj.0.weight"] = np.asarray(params[f"{name}_ln"]["scale"])
        sd[f"model_nn.{name}_proj.0.bias"] = np.asarray(params[f"{name}_ln"]["bias"])
        sd[f"model_nn.{name}_proj.1.weight"] = np.asarray(params[f"{name}_proj"]["kernel"]).T
    sd["model_nn.rp_proj.relative_attention_bias.weight"] = np.asarray(
        params["rp_proj"]["relative_attention_bias"]["embedding"]
    )

    st = params["st_module"]
    for lname, layer in st.items():
        if not lname.startswith("layer_"):
            continue
        i = int(lname.split("_")[1])
        tp = f"model_nn.st_module.encoder.layers.{i}"
        for norm in ("norm1", "norm2"):
            sd[f"{tp}.{norm}.weight"] = np.asarray(layer[norm]["scale"])
            sd[f"{tp}.{norm}.bias"] = np.asarray(layer[norm]["bias"])
        for lin in _ATTN_LINEARS:
            sd[f"{tp}.attn.{lin}.weight"] = np.asarray(layer["attn"][lin]["kernel"]).T
        sd[f"{tp}.attn.fc_out.bias"] = np.asarray(layer["attn"]["fc_out"]["bias"])
        sd[f"{tp}.attn.trained_point_weight"] = np.asarray(
            layer["attn"]["trained_point_weight"]
        )
        for torch_idx, flax_name in (("0", "fc1"), ("3", "fc2")):
            sd[f"{tp}.ffn.ff.{torch_idx}.weight"] = np.asarray(
                layer["ffn"][flax_name]["kernel"]
            ).T
            sd[f"{tp}.ffn.ff.{torch_idx}.bias"] = np.asarray(layer["ffn"][flax_name]["bias"])

    dh = st["diff_head"]
    for head in ("fc_t", "fc_eps"):
        tp = f"model_nn.st_module.diff_head.{head}"
        sd[f"{tp}.0.weight"] = np.asarray(dh[f"{head}_ln"]["scale"])
        sd[f"{tp}.0.bias"] = np.asarray(dh[f"{head}_ln"]["bias"])
        for torch_idx, flax_name in (("1", f"{head}_fc1"), ("3", f"{head}_fc2")):
            sd[f"{tp}.{torch_idx}.weight"] = np.asarray(dh[flax_name]["kernel"]).T
            sd[f"{tp}.{torch_idx}.bias"] = np.asarray(dh[flax_name]["bias"])

    sd["model_nn.step_emb.dummy"] = np.zeros((0,), np.float32)
    return sd


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch-layout state dict from disk -> flax variables.

    ``.npz`` holds the same key layout without the torch container (what
    ``python -m se3diff_tpu.train`` and the finetune trainer export); for
    ``.ckpt``/``.pt``, torch is used only as a host-side deserializer
    (weights_only mode).
    """
    if str(path).endswith(".npz"):
        with np.load(path) as sd:
            return torch_state_dict_to_flax({k: sd[k] for k in sd.files})
    import torch

    sd = torch.load(path, weights_only=True, map_location="cpu")
    return torch_state_dict_to_flax({k: v.numpy() for k, v in sd.items()})
