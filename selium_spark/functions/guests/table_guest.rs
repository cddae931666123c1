//! Second toolchain guest: static lookup table -> LLVM emits a real
//! linear-memory data segment (the section layout the in-repo
//! assembler never produces). #![no_core] boilerplate as in
//! splitmix_guest.rs.
#![no_core]
#![feature(no_core, lang_items)]
#![allow(internal_features)]
#![crate_type = "cdylib"]

#[lang = "pointee_sized"]
pub trait PointeeSized {}
#[lang = "meta_sized"]
pub trait MetaSized: PointeeSized {}
#[lang = "sized"]
pub trait Sized: MetaSized {}
#[lang = "copy"]
pub trait Copy {}
#[lang = "legacy_receiver"]
pub trait LegacyReceiver {}
impl<T: PointeeSized> LegacyReceiver for &T {}
impl Copy for i64 {}
impl Copy for u64 {}
impl Copy for u32 {}
impl Copy for u8 {}
impl Copy for usize {}

#[lang = "add"]
pub trait Add<Rhs = Self> {
    type Output;
    fn add(self, rhs: Rhs) -> Self::Output;
}
impl Add for u64 { type Output = u64; fn add(self, rhs: u64) -> u64 { self + rhs } }
impl Add for i64 { type Output = i64; fn add(self, rhs: i64) -> i64 { self + rhs } }
impl Add for usize { type Output = usize; fn add(self, rhs: usize) -> usize { self + rhs } }
impl Add for u32 { type Output = u32; fn add(self, rhs: u32) -> u32 { self + rhs } }

#[lang = "bitand"]
pub trait BitAnd<Rhs = Self> {
    type Output;
    fn bitand(self, rhs: Rhs) -> Self::Output;
}
impl BitAnd for u64 { type Output = u64; fn bitand(self, rhs: u64) -> u64 { self & rhs } }

#[lang = "shr"]
pub trait Shr<Rhs = Self> {
    type Output;
    fn shr(self, rhs: Rhs) -> Self::Output;
}
impl Shr<u32> for u64 { type Output = u64; fn shr(self, rhs: u32) -> u64 { self >> rhs } }

#[lang = "eq"]
pub trait PartialEq<Rhs = Self> {
    fn eq(&self, rhs: &Rhs) -> bool;
}
impl PartialEq for u64 { fn eq(&self, rhs: &u64) -> bool { *self == *rhs } }
impl PartialEq for u32 { fn eq(&self, rhs: &u32) -> bool { *self == *rhs } }

#[lang = "partial_ord"]
pub trait PartialOrd<Rhs = Self>: PartialEq<Rhs> {
    fn lt(&self, rhs: &Rhs) -> bool;
}
impl PartialOrd for u64 { fn lt(&self, rhs: &u64) -> bool { *self < *rhs } }
impl PartialOrd for u32 { fn lt(&self, rhs: &u32) -> bool { *self < *rhs } }

#[lang = "drop_glue"]
pub unsafe fn drop_glue<T: MetaSized>(_: *mut T) {}

#[lang = "sync"]
pub unsafe trait Sync {}
unsafe impl Sync for [u8; 16] {}

#[lang = "index"]
pub trait Index<Idx> {
    type Output;
    fn index(&self, i: Idx) -> &Self::Output;
}

// a static table LLVM must place in a linear-memory data segment
static WEIGHTS: [u8; 16] = [1, 3, 7, 15, 2, 6, 14, 4, 12, 5, 13, 8, 9, 10, 11, 16];

/// Sum of WEIGHTS over the 16 nibbles of x (reads linear memory).
#[no_mangle]
pub extern "C" fn nibble_weight_sum(x: i64) -> i64 {
    let mut v = x as u64;
    let mut acc = 0u64;
    let mut i = 0u32;
    while i < 16u32 {
        let nib = (v & 15u64) as usize;
        let base = &WEIGHTS as *const u8 as usize;
        let w = unsafe { *((base + nib) as *const u8) } as u64;
        acc = acc + w;
        v = v >> 4u32;
        i = i + 1u32;
    }
    acc as i64
}
