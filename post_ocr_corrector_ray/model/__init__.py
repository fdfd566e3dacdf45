"""NumPy character-level seq2seq corrector (no torch in this container)."""
