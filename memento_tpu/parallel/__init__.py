"""memento_tpu.parallel"""
