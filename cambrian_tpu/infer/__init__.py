from .engine import GenerationConfig, GenerationEngine
