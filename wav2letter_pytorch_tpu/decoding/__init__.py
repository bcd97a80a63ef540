from .beam_device import DeviceBeamDecoder, beam_search_device
from .decoder import (Decoder, GreedyDecoder, HotwordTrie,
                      IncrementalPrefixBeam, PrefixBeamSearchLMDecoder,
                      get_time_per_word, prefix_beam_search)
from .forced_align import forced_align, word_alignments

__all__ = ['Decoder', 'DeviceBeamDecoder', 'GreedyDecoder', 'HotwordTrie',
           'IncrementalPrefixBeam', 'PrefixBeamSearchLMDecoder',
           'beam_search_device', 'forced_align', 'get_time_per_word',
           'prefix_beam_search', 'word_alignments']
