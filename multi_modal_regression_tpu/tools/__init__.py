"""Data-preparation tools: synthetic datasets, crop/flip/augmentation writers."""
