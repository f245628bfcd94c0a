"""Regenerate tests/golden/nomic_golden.npz from the independent torch
implementation in tests/test_golden_parity.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

from test_golden_parity import GOLDEN, sample_tokens, synth_hf_state, torch_nomic_forward

STATE_SEED, TOKEN_SEED = 7, 11
state = synth_hf_state(STATE_SEED)
ids, mask = sample_tokens(TOKEN_SEED)
emb = torch_nomic_forward(state, ids, mask)
GOLDEN.parent.mkdir(parents=True, exist_ok=True)
np.savez_compressed(GOLDEN, state_seed=STATE_SEED, ids=ids, mask=mask,
                    embeddings=emb)
print(f"wrote {GOLDEN} embeddings {emb.shape}")
