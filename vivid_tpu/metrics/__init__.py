from .detectors import Detector, StubDetector, get_detector, metric_specs
from .stats import calculate_stats_for_iterable_nvs
from .frechet import calculate_metrics_from_stats_nvs, frechet_distance
from .api import get_metrics
