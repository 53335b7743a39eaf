"""(placeholder — filled in a later milestone)"""
