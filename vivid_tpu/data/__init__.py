from .encoders import Encoder, StandardRGBEncoder
from .scenes import SceneDataset, save_scene, synthesize_scene
from .collate import VanillaCollate, DualSourceCollate, BatchLoader
