from posegen_tpu.data.h5dataset import H5RayDataset, RayBatchLoader  # noqa: F401
from posegen_tpu.data.writer import write_pose_h5  # noqa: F401
from posegen_tpu.data.catalog import DATASET_CATALOG, load_data  # noqa: F401
