"""memento_tpu.models"""
