from gvl_tpu.models.gvl import GVLModel, build_model  # noqa: F401
