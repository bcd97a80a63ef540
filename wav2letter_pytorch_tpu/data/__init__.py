from .label_sets import labels_map, resolve_labels

__all__ = ['labels_map', 'resolve_labels']
