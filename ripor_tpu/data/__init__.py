from ripor_tpu.data.tokenizer import (
    DOC_PREFIX,
    HashTokenizer,
    QUERY_PREFIX,
    TextTokenizer,
    UnigramTokenizer,
    tokenize_docs,
    tokenize_queries,
)
from ripor_tpu.data.datasets import (
    Collection,
    Seq2SeqExamples,
    TeacherScoreExamples,
    load_docid_to_smtid,
    load_qrel,
    parse_smtid_str,
    save_docid_to_smtid,
    smtid_to_str,
)
from ripor_tpu.data.loader import PrefetchLoader, device_prefetch, epoch_batches
from ripor_tpu.data.collators import (
    MarginMSECollator,
    PretrainCollator,
    Seq2SeqCollator,
    batches_from_seq2seq,
    batches_from_teacher_examples,
)

__all__ = [
    "TextTokenizer", "UnigramTokenizer", "HashTokenizer",
    "QUERY_PREFIX", "DOC_PREFIX", "tokenize_queries", "tokenize_docs",
    "Collection", "TeacherScoreExamples", "Seq2SeqExamples",
    "load_docid_to_smtid", "save_docid_to_smtid", "load_qrel",
    "parse_smtid_str", "smtid_to_str",
    "MarginMSECollator", "Seq2SeqCollator", "PretrainCollator",
    "batches_from_teacher_examples", "batches_from_seq2seq",
    "PrefetchLoader", "device_prefetch", "epoch_batches",
]
