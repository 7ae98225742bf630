"""Ray-Data-native extraction engine (see SURVEY.md)."""
