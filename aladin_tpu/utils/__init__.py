from aladin_tpu.utils.logging import AverageMeter, LogCollector, setup_logger  # noqa: F401
