"""Source/scan layer: table loaders and the binary decode kernel."""
