"""igs_tpu — a TPU-native framework for Instant Gaussian Stream (IGS).

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of asd56585452/IGS
(CVPR'25 "Instant Gaussian Stream"): a differentiable RaDe-GS-style Gaussian
rasterizer, the AGM-Net anchor-driven Gaussian motion network, streaming
reconstruction with per-key-frame refinement, and data/training drivers —
designed TPU-first (SPMD meshes, static shapes, fused XLA graphs, Pallas
kernels) rather than ported from the reference CUDA/torch stack.

Component registry mirrors the reference's import-string wiring
(/root/reference/igs/__init__.py:4-9) so configs that name classes by path
keep working.
"""

import importlib

__version__ = "0.1.0"


def find(cls_string: str):
    """Resolve a ``module.path.ClassName`` import string to the class.

    Reference parity: igs.find (/root/reference/igs/__init__.py:4-9). Class
    paths beginning with ``igs.`` are remapped onto this package so the
    reference's YAML configs can be used unmodified.
    """
    if cls_string.startswith("igs.") and not cls_string.startswith("igs_tpu."):
        cls_string = _REMAP.get(cls_string, cls_string)
    module_string = ".".join(cls_string.split(".")[:-1])
    cls_name = cls_string.split(".")[-1]
    module = importlib.import_module(module_string)
    return getattr(module, cls_name)


# Reference class-path → igs_tpu class-path remapping (see docstring).
_REMAP = {
    "igs.models.unimatch.unimatch.UniMatch": "igs_tpu.models.unimatch.UniMatch",
    "igs.models.unimatch.transformer.FeatureTransformer": "igs_tpu.models.swin.FeatureTransformer",
    "igs.models.unimatch.transformer.FeatureTransformerMy": "igs_tpu.models.swin.FeatureTransformerMy",
    "igs.models.transformers.Transformer1D": "igs_tpu.models.transformer1d.Transformer1D",
    "igs.models.grid_encoder.GridEncoder": "igs_tpu.models.grid_encoder.GridEncoder",
    "igs.models.gs.GS3DRenderer": "igs_tpu.models.renderer.GS3DRenderer",
    "igs.models.networks.MLP": "igs_tpu.models.networks.MLP",
    "igs.models.gaussian_model.GaussianModel": "igs_tpu.stream.refine.RefineState",
    "igs.data.data.N3dDataset": "igs_tpu.data.dataset.N3dDataset",
    "igs.data.infer_data.N3dDataset": "igs_tpu.data.infer_data.N3dInferDataset",
}
