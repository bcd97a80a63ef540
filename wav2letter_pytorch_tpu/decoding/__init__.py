from .beam_device import DeviceBeamDecoder, beam_search_device
from .decoder import (Decoder, GreedyDecoder, HotwordTrie,
                      IncrementalPrefixBeam, PrefixBeamSearchLMDecoder,
                      get_time_per_word, prefix_beam_search)

__all__ = ['Decoder', 'DeviceBeamDecoder', 'GreedyDecoder', 'HotwordTrie',
           'IncrementalPrefixBeam', 'PrefixBeamSearchLMDecoder',
           'beam_search_device', 'get_time_per_word', 'prefix_beam_search']
