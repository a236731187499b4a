from ripor_tpu.data.tokenizer import (
    DOC_PREFIX,
    HashTokenizer,
    QUERY_PREFIX,
    TextTokenizer,
    UnigramTokenizer,
    WordTokenizer,
    tokenize_docs,
    tokenize_queries,
)
from ripor_tpu.data.datasets import (
    BceExamples,
    Collection,
    Seq2SeqExamples,
    TeacherScoreExamples,
    build_bce_examples,
    load_docid_to_smtid,
    load_qrel,
    parse_smtid_str,
    save_bce_examples,
    save_docid_to_smtid,
    smtid_to_str,
)
from ripor_tpu.data.loader import PrefetchLoader, device_prefetch, epoch_batches
from ripor_tpu.data.collators import (
    BertBceCollator,
    MarginMSECollator,
    PretrainCollator,
    Seq2SeqCollator,
    T5SeqBceCollator,
    batches_from_bce,
    batches_from_joint,
    batches_from_seq2seq,
    batches_from_teacher_examples,
)

__all__ = [
    "TextTokenizer", "UnigramTokenizer", "HashTokenizer",
    "WordTokenizer",
    "QUERY_PREFIX", "DOC_PREFIX", "tokenize_queries", "tokenize_docs",
    "Collection", "TeacherScoreExamples", "Seq2SeqExamples", "BceExamples",
    "build_bce_examples", "save_bce_examples",
    "load_docid_to_smtid", "save_docid_to_smtid", "load_qrel",
    "parse_smtid_str", "smtid_to_str",
    "MarginMSECollator", "Seq2SeqCollator", "PretrainCollator",
    "T5SeqBceCollator", "BertBceCollator",
    "batches_from_teacher_examples", "batches_from_seq2seq",
    "batches_from_joint",
    "batches_from_bce",
    "PrefetchLoader", "device_prefetch", "epoch_batches",
]
