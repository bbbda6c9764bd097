"""Alignment state encoding shared across the framework.

Mirrors the reference 3-state convention (reference: deepblast/constants.py:1
``x, m, y = 0, 1, 2``): ``x`` consumes a residue of the first sequence (a gap
in the second), ``m`` is a match, ``y`` consumes a residue of the second
sequence.
"""

x, m, y = 0, 1, 2

#: Number of DP states.
NUM_STATES = 3

#: Character rendering of states used by the string alignment API
#: (reference: deepblast/dataset/utils.py:31-38 ``revstate_f``).
STATE_CHARS = {x: '1', m: ':', y: '2'}
