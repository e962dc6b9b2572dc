"""Command-line drivers — the reference's ``train.py``/``eval.py``/
``predict_video.py`` entry points (SURVEY.md §1 L5), preserving the
``config JSON + checkpoint (+ video)`` public contract."""
