from . import ppm, plots, profiling, checkpoint
