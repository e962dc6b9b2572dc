from vct_tpu.data.datasets import MSRVTTDataset, MSVDDataset, VATEXDataset, build_dataset  # noqa: F401
from vct_tpu.data.loader import DataLoader  # noqa: F401
