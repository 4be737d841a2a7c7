from .store import init_random_params, load_params, save_params

__all__ = ["save_params", "load_params", "init_random_params"]
