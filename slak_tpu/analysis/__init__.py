from slak_tpu.analysis.erf import get_input_grad, erf_contribution, analyze_erf, get_rectangle
from slak_tpu.analysis.flops import count_model_flops

__all__ = ["get_input_grad", "erf_contribution", "analyze_erf",
           "get_rectangle", "count_model_flops"]
