from .jasper import Jasper, JasperBlock, MaskedConv
from .wav2letter import Conv1dBlock, Wav2Letter

# Model registry (reference train.py:16-19).
name_to_model = {
    'wav2letter': Wav2Letter,
    'jasper': Jasper,
}

__all__ = ['Wav2Letter', 'Jasper', 'Conv1dBlock', 'JasperBlock',
           'MaskedConv', 'name_to_model']
