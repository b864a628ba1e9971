"""Datasets, augmentation, GT map generation, synthetic text rendering."""
