from .build import (build_decoder, build_frontend, build_labels, build_model,
                    build_optimizer, load_run, model_input_size)
from .trainer import Trainer, TrainState, masked_ctc_mean

__all__ = ['Trainer', 'TrainState', 'masked_ctc_mean', 'build_model',
           'build_frontend', 'build_decoder', 'build_labels',
           'build_optimizer', 'model_input_size', 'load_run']
