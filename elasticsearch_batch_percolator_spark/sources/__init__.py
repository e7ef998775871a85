from .registry import CompiledRegistry, load_registry, save_registry  # noqa: F401
