"""Core abstractions: configs, registry, cache, repositories, loader, importer.

TPU-native counterpart of the reference's backend-agnostic layer
(/root/reference/NeuralCodecs.Core). Nothing in this package touches JAX
device state except the importer's final `jax.device_put`.
"""
