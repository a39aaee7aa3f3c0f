"""Sampling engine: proposals, MH/HMC kernels, tuning, chains."""
