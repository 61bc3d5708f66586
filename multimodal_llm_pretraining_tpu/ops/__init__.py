from .attention import dot_product_attention, AttnImpl, default_attn_impl

__all__ = ["dot_product_attention", "AttnImpl", "default_attn_impl"]
