"""Native (C) runtime components — host-side hot loops behind ctypes."""
