from vct_tpu.evalcap.scorer import COCOScorer, make_coco_sample  # noqa: F401
