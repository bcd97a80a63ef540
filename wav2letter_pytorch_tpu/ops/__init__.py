from .ctc import ctc_loss

__all__ = ['ctc_loss']
