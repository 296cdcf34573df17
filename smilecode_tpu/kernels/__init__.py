from smilecode_tpu.kernels.modet_attn import modet_attention_pallas

__all__ = ["modet_attention_pallas"]
