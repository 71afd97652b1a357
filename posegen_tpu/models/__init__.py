from posegen_tpu.models import nerf  # noqa: F401
