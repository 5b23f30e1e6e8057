from dpr_scale_tpu.config.loader import Config, load_config, parse_overrides

__all__ = ["Config", "load_config", "parse_overrides"]
