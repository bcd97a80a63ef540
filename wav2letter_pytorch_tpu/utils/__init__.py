from .runtime import enable_compilation_cache, model_summary

__all__ = ['enable_compilation_cache', 'model_summary']
