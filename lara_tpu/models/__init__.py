from lara_tpu.models.lara import LaRaNet

__all__ = ["LaRaNet"]
