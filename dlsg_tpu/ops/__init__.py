"""TPU-native compute ops: LSTM scans, beam search, losses, pallas kernels."""
