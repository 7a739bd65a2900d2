from tbist_tpu.ops import colorspace, filters, losses, resize

__all__ = ["colorspace", "filters", "losses", "resize"]
