from aladin_tpu.ops import alignment, losses, masking, similarity  # noqa: F401
