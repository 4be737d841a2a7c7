from .store import (
    init_random_params,
    load_params,
    load_params_meta,
    save_params,
)

__all__ = [
    "save_params",
    "load_params",
    "load_params_meta",
    "init_random_params",
]
