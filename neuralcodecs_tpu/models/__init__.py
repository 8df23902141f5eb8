"""Model zoo: SNAC, DAC, Encodec, Dia — TPU-native JAX implementations."""
