from posegen_tpu.ops import embedding  # noqa: F401
from posegen_tpu.ops import encoders  # noqa: F401
from posegen_tpu.ops import sampling  # noqa: F401
