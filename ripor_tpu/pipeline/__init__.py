from ripor_tpu.pipeline.datagen import (
    DECAY_TO_FACTOR,
    MNT_TO_SMTID_FACTOR,
    attach_lng_knp_scores,
    expand_prefix_rankdata,
    group_docids_by_prefix,
    merge_rankdata_with_decay,
    prefix_smtid_strings,
)
from ripor_tpu.pipeline.recipe import Workspace

__all__ = [
    "DECAY_TO_FACTOR", "MNT_TO_SMTID_FACTOR", "attach_lng_knp_scores",
    "expand_prefix_rankdata", "group_docids_by_prefix",
    "merge_rankdata_with_decay", "prefix_smtid_strings", "Workspace",
]
