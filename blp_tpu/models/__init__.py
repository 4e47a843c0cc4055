from blp_tpu.models import scoring  # noqa: F401
