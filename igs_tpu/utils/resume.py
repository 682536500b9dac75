"""Checkpoint overlay: GMFlow backbone + AGM resume onto init params.

Shared by infer_stream.py and tested directly — round-4 regression: the
inline version rebuilt params from a stale flat dict after a msgpack
load, silently discarding the native-checkpoint resume (the streaming
outputs were bit-identical to random init).
"""

from __future__ import annotations

import os

import numpy as np


def load_params_with_overlays(params, system_cfg: dict, opt_cfg: dict):
    """Overlay (in order) the GMFlow backbone checkpoint and opt.resume
    (native .msgpack or reference torch .bin/.pth) onto ``params``.

    Shape-checked partial load everywhere (main.py:131-149 semantics).
    Returns the updated params pytree.
    """
    import flax
    import jax.numpy as jnp

    flat = flax.traverse_util.flatten_dict(params["params"])

    def overlay(converted, prefix=()):
        loaded = 0
        for k, v in flax.traverse_util.flatten_dict(converted).items():
            key = prefix + k
            if key in flat and flat[key].shape == np.asarray(v).shape:
                flat[key] = jnp.asarray(v)
                loaded += 1
        return loaded

    gmflow_path = (system_cfg.get("backbone", {}) or {}).get(
        "pretrained_model_name_or_path", "")
    if gmflow_path and os.path.exists(gmflow_path):
        from igs_tpu.models.torch_convert import (
            convert_gmflow_checkpoint, load_torch_file,
        )

        n = overlay(convert_gmflow_checkpoint(
            load_torch_file(gmflow_path))["params"], ("backbone",))
        print(f"loaded {n} GMFlow tensors")

    resume = opt_cfg.get("resume", "")
    if resume and os.path.exists(resume):
        if resume.endswith(".msgpack"):
            from igs_tpu.train.driver import load_checkpoint

            loaded_params, _ = load_checkpoint(
                resume,
                {"params": flax.traverse_util.unflatten_dict(flat)})
            flat = flax.traverse_util.flatten_dict(loaded_params["params"])
            print(f"loaded native checkpoint {resume}")
        else:
            from igs_tpu.models.torch_convert import (
                convert_igs_checkpoint, fix_mlp_output_layer,
                load_torch_file,
            )

            conv = convert_igs_checkpoint(load_torch_file(resume))
            fix_mlp_output_layer(conv["params"])
            n = overlay(conv["params"])
            print(f"loaded {n} AGM tensors from torch ckpt {resume} "
                  f"({len(conv['unmapped'])} unmapped)")

    return {"params": flax.traverse_util.unflatten_dict(flat)}
