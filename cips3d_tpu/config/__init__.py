from cips3d_tpu.config.config import (  # noqa: F401
    Config,
    apply_dotted_overrides,
    build_model,
    deep_merge,
    dump_config,
    parse_args,
    register,
    registry_get,
    resolve_command,
)
