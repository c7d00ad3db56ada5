"""data_quality_ray — a Ray-Data-native data-quality / quality-filter engine.

A from-scratch rebuild of the capabilities of the Talend Data Quality
libraries (reference: coheigea/data-quality, see SURVEY.md) expressed as
``ray.data.Dataset`` pipelines: vectorized ``map_batches`` over zero-copy
Arrow batches, actor pools for stateful (model / dictionary) stages, and
``groupby`` / ``repartition`` for the wide steps.

Flagship pipeline (north star): a streaming quality filter over tables of
image + caption pairs — heuristic caption rules, language ID, perplexity
scoring, PII/toxicity scrubbing, phash-keyed dedup, with per-partition
lineage records enabling exact resume.

Nothing here calls ``ray.init()`` — the caller owns the Ray session.
"""

__version__ = "0.1.0"
