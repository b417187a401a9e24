"""Config: YAML loading, dot-path CLI overrides, application construction."""

from dsopp_tpu.config.loader import apply_overrides, build_application, load_config  # noqa: F401
