"""Phase-3 training-data flywheel: prefix grouping, decay-weighted merge,
prefix-score attachment. Pure-artifact glue with EXACT reference semantics
(SURVEY.md §3.5 calls this the easiest place to go silently wrong).

Reference scripts mirrored:
  * get_qid_smtid_docids_from_teacher_rerank_data.py:5-52  -> group_docids_by_prefix
  * get_qid_smtids_scores_jsonl_examples.py:9-16,42-113    -> DECAY_TO_FACTOR,
    merge_rankdata_with_decay (D^R ∪ D^B, per-prefix max * factor, top-100)
  * fully_create_lng_knp_examples_from_original_examples.py:6-33
                                                           -> attach_lng_knp_scores
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Mapping, Optional, Sequence

import numpy as np

# geometric decay factors per prefix length (reference :9-16). decay=2 is
# the published configuration (w_4=1/2, w_8=3/4, w_16=7/8, w_32=1).
DECAY_TO_FACTOR: Dict[int, Dict[int, float]] = {
    1: {4: 4. / 32, 8: 4. / 32 + 8. / 32, 16: 4. / 32 + 8. / 32 + 16. / 32},
    2: {4: 1. / 2, 8: 1. / 2 + 0.25, 16: 1. / 2 + 0.25 + 0.125, 32: 1.},
    8: {4: 0.8, 8: 0.8 + 0.2 * 0.8,
        16: 0.8 + 0.2 * 0.8 + (1 - 0.8 - 0.2 * 0.8) * 0.8, 32: 1.},
}

# per-loss prefix-score factors (reference lng_knp script :7-10): the ratio
# of the prefix factor to the example's own (max_new_token) factor
MNT_TO_SMTID_FACTOR: Dict[int, Dict[str, float]] = {
    32: {"smtid_4": 0.5, "smtid_8": 0.75, "smtid_16": 0.875},
    16: {"smtid_4": 0.5 / 0.875, "smtid_8": 0.75 / 0.875},
    8: {"smtid_4": 0.5 / 0.75},
}


def group_docids_by_prefix(qid_to_docids: Mapping[str, Sequence[str]],
                           docid_to_smtid_str: Mapping[str, str]
                           ) -> Dict[str, Dict[str, List[str]]]:
    """{qid: [docids]} + docid->prefix-smtid-string -> {qid: {smtid: [docids]}}
    (the D^R dense-teacher grouping)."""
    out: Dict[str, Dict[str, List[str]]] = {}
    for qid, docids in qid_to_docids.items():
        smtid_map: Dict[str, List[str]] = {}
        for docid in docids:
            smtid = docid_to_smtid_str[str(docid)]
            smtid_map.setdefault(smtid, []).append(str(docid))
        out[str(qid)] = smtid_map
    return out


def prefix_smtid_strings(codes: np.ndarray, docids: Sequence[str],
                         prefix_len: int) -> Dict[str, str]:
    """docid -> 'c1_..._cp' prefix string (reference truncation :17-22)."""
    return {str(d): "_".join(str(int(c)) for c in row[:prefix_len])
            for d, row in zip(docids, codes)}


RankData = Mapping[str, Mapping[str, Sequence[Sequence]]]  # qid->smtid->[(docid,score)]


def _smtid_scores(rankdata_for_qid: Mapping[str, Sequence[Sequence]],
                  factor: float) -> Dict[str, float]:
    return {smtid: max(x[1] for x in pairs) * factor
            for smtid, pairs in rankdata_for_qid.items()}


def merge_rankdata_with_decay(original: RankData, self_data: RankData,
                              max_new_token: int, decay: int = 2,
                              keep_top: int = 100) -> List[Dict]:
    """D^R (dense-teacher) ∪ D^B (self beam-search) merge (reference
    :42-113): per-smtid score = max over (docid, score) pairs * decay factor;
    D^R truncated to top-100 BEFORE the union (exactly as the reference —
    self-data smtids join afterwards and can exceed 100); collisions keep
    the max; output examples sorted by score desc."""
    factor = DECAY_TO_FACTOR[decay][max_new_token]
    merged: Dict[str, Dict[str, float]] = {}
    for qid, rd in original.items():
        scores = _smtid_scores(rd, factor)
        if keep_top:
            scores = dict(sorted(scores.items(), key=lambda x: x[1],
                                 reverse=True)[:keep_top])
        merged[qid] = scores
    for qid, rd in self_data.items():
        scores = _smtid_scores(rd, factor)
        bucket = merged.setdefault(qid, {})
        for smtid, s in scores.items():
            bucket[smtid] = max(s, bucket[smtid]) if smtid in bucket else s
    examples = []
    for qid, smtid_to_score in merged.items():
        pairs = sorted(smtid_to_score.items(), key=lambda x: x[1], reverse=True)
        examples.append({"qid": qid,
                         "smtids": [p[0] for p in pairs],
                         "scores": [p[1] for p in pairs]})
    return examples


def attach_lng_knp_scores(examples: Iterable[Dict], max_new_token: int
                          ) -> List[Dict]:
    """Attach smtid_{4,8,16}_scores = scores * factor (reference :26-33)."""
    factors = MNT_TO_SMTID_FACTOR[max_new_token]
    out = []
    for ex in examples:
        ex = dict(ex)
        for name, f in factors.items():
            ex[f"{name}_scores"] = [s * f for s in ex["scores"]]
        out.append(ex)
    return out


def rankdata_to_docid_groups(rankdata: RankData
                             ) -> Dict[str, Dict[str, List[str]]]:
    """{qid: {smtid: [(docid, score)]}} -> {qid: {smtid: [docids]}}
    (reference argparse_from_qid_smtid_rank_to_qid_smtid_docids.py)."""
    return {qid: {smtid: [str(p[0]) for p in pairs]
                  for smtid, pairs in rd.items()}
            for qid, rd in rankdata.items()}


def expand_prefix_rankdata(rankdata_16: RankData,
                           docid_to_smtid_str_32: Mapping[str, str]
                           ) -> Dict[str, Dict[str, List]]:
    """Prefix-16 -> prefix-32 expansion (reference
    expand_smtid_for_qid_smtid_docids.py:35-85): each (docid, score) moves
    under the docid's full-length smtid, keeping the teacher score."""
    out: Dict[str, Dict[str, List]] = {}
    for qid, rd in rankdata_16.items():
        bucket: Dict[str, List] = {}
        for _, pairs in rd.items():
            for docid, score in pairs:
                full = docid_to_smtid_str_32[str(docid)]
                bucket.setdefault(full, []).append([docid, score])
        out[qid] = bucket
    return out
