from .events import EventStream, empty_stream, load, load_csv, load_npz, load_raw_i32, save_csv, save_npz, save_raw_i32
from .slicing import EventSlices, slice_by_count, slice_by_time, decimate
from . import synthetic
