"""Sources: transcript derivation/synthesis, N-Quads IO, format registry."""
