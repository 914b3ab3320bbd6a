from slak_tpu.sparsity.masking import (
    MaskConfig,
    MaskState,
    cosine_prune_rate,
    select_maskable,
    init_masks,
    apply_mask,
    apply_mask_to_tree,
    truncate_weights,
    sparsity_report,
    erk_densities,
    snip_sparsities,
)

__all__ = [
    "MaskConfig", "MaskState", "cosine_prune_rate", "select_maskable",
    "init_masks", "apply_mask", "apply_mask_to_tree", "truncate_weights",
    "sparsity_report", "erk_densities", "snip_sparsities",
]
