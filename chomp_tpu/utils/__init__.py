from chomp_tpu.utils.tree import pytree_dataclass, replace

__all__ = ["pytree_dataclass", "replace"]
