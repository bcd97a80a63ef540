"""Hebrew final-letter form normalization.

Parity surface: /root/reference/data/language_specific_tools.py:1-21 —
bidirectional normal<->final Hebrew letter conversion using suffix-aware
(word-final) replacement.
"""

_NORMAL_TO_FINAL = [('צ', 'ץ'), ('פ', 'ף'), ('כ', 'ך'), ('מ', 'ם'), ('נ', 'ן')]


def _convert(strings, pairs):
    if isinstance(strings, list):
        return [_convert(s, pairs) for s in strings]
    # Operate on a sentinel-terminated copy so word-final letters at the end
    # of the string are treated like letters followed by a space.
    res = strings + ' '
    for src, dst in pairs:
        res = res.replace(src + ' ', dst + ' ')
    return res[:-1]


def hebrew_normal_to_final(strings):
    return _convert(strings, _NORMAL_TO_FINAL)


def hebrew_final_to_normal(strings):
    return _convert(strings, [(b, a) for a, b in _NORMAL_TO_FINAL])
