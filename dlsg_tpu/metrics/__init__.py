"""Caption metrics: PTB-style tokenizer, BLEU, CIDEr, ROUGE-L, METEOR, scorer.

Re-implements the reference's vendored coco-caption stack (`caption-eval/`)
without Java subprocesses: the PTBTokenizer jar and meteor-1.5.jar are replaced
by native Python/C++ implementations (SURVEY.md §2.5 'TPU-native equivalents').
"""

from dlsg_tpu.metrics.scorer import COCOScorer, score_captions  # noqa: F401
