"""memento_tpu: TPU-native single-cell method-of-moments statistics engine."""
__version__ = "0.1.0"
