"""Ray-Data-native web/PDF main-content extraction engine (see SURVEY.md).

Public API re-exports — the pipelines a reference user runs today:

    from ebook_ocr_ray import extraction_pipeline, lineage
    ds = extraction_pipeline(sf_dir)          # url -> canonical text
"""


def __getattr__(name):
    # lazy re-exports: importing the package must not pull in Ray until a
    # pipeline is actually requested
    _exports = {
        "extraction_pipeline": "ebook_ocr_ray.pipelines.extraction",
        "pages_dataset": "ebook_ocr_ray.pipelines.extraction",
        "dedup_exact": "ebook_ocr_ray.pipelines.extraction",
        "sequence_dedup": "ebook_ocr_ray.pipelines.extraction",
        "lineage": "ebook_ocr_ray.pipelines.extraction",
        "corpus_metrics": "ebook_ocr_ray.pipelines.extraction",
        "verify_against_golden": "ebook_ocr_ray.pipelines.extraction",
        "structural_pipeline": "ebook_ocr_ray.stages.structural",
        "ExtractionConfig": "ebook_ocr_ray.config",
    }
    if name in _exports:
        import importlib

        return getattr(importlib.import_module(_exports[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
