from posegen_tpu.render import raycast  # noqa: F401
