from .config import CambrianConfig
