from .beam_device import DeviceBeamDecoder, beam_search_device
from .decoder import (Decoder, GreedyDecoder, IncrementalPrefixBeam,
                      PrefixBeamSearchLMDecoder, get_time_per_word,
                      prefix_beam_search)

__all__ = ['Decoder', 'DeviceBeamDecoder', 'GreedyDecoder',
           'IncrementalPrefixBeam', 'PrefixBeamSearchLMDecoder',
           'beam_search_device', 'get_time_per_word', 'prefix_beam_search']
