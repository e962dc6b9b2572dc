from vct_tpu.models.mmt4caption import MMT4Caption  # noqa: F401
