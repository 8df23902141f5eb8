"""AudioTools-equivalent DSP layer: STFT, mel, resampling, loudness, effects.

TPU rebuild of /root/reference/NeuralCodecs.Torch/AudioTools/ — all ops are
jit-able jnp functions over channels-last batches.
"""
