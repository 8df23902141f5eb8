"""Command-line interface (counterpart of NeuralCodecs.Torch.Examples)."""
