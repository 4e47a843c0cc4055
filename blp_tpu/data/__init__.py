from blp_tpu.data.sampling import sample_negative_indices  # noqa: F401
