//! Third toolchain guest: a static table of function pointers makes
//! LLVM emit a funcref ELEMENT SEGMENT + call_indirect — real
//! compiler output for indirect dispatch (the shape trait objects
//! lower to). #![no_core] boilerplate as in splitmix_guest.rs.
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
impl Copy for usize {}

#[lang = "drop_glue"]
pub unsafe fn drop_glue<T: MetaSized>(_: *mut T) {}

#[lang = "sync"]
pub unsafe trait Sync {}
unsafe impl Sync for [fn(i64) -> i64; 4] {}

#[lang = "add"]
pub trait Add<Rhs = Self> {
    type Output;
    fn add(self, rhs: Rhs) -> Self::Output;
}
impl Add for i64 { type Output = i64; fn add(self, rhs: i64) -> i64 { self + rhs } }
impl Add for usize { type Output = usize; fn add(self, rhs: usize) -> usize { self + rhs } }

#[lang = "mul"]
pub trait Mul<Rhs = Self> {
    type Output;
    fn mul(self, rhs: Rhs) -> Self::Output;
}
impl Mul for i64 { type Output = i64; fn mul(self, rhs: i64) -> i64 { self * rhs } }
impl Mul for usize { type Output = usize; fn mul(self, rhs: usize) -> usize { self * rhs } }

#[lang = "sub"]
pub trait Sub<Rhs = Self> {
    type Output;
    fn sub(self, rhs: Rhs) -> Self::Output;
}
impl Sub for i64 { type Output = i64; fn sub(self, rhs: i64) -> i64 { self - rhs } }

#[lang = "bitand"]
pub trait BitAnd<Rhs = Self> {
    type Output;
    fn bitand(self, rhs: Rhs) -> Self::Output;
}
impl BitAnd for i64 { type Output = i64; fn bitand(self, rhs: i64) -> i64 { self & rhs } }

fn plus_one(x: i64) -> i64 { x + 1i64 }
fn double_it(x: i64) -> i64 { x * 2i64 }
fn negate_it(x: i64) -> i64 { 0i64 - x }
fn keep_it(x: i64) -> i64 { x }

static FNS: [fn(i64) -> i64; 4] = [plus_one, double_it, negate_it, keep_it];

/// Dispatch through the static fn-pointer table: sel & 3 picks the
/// routine. The table load is an i32.load of a table index from the
/// data segment; the call is call_indirect over the element-segment-
/// initialized funcref table.
#[no_mangle]
pub extern "C" fn route_apply(x: i64, sel: i64) -> i64 {
    let i = (sel & 3i64) as usize;
    let base = &FNS as *const fn(i64) -> i64 as usize;
    let f = unsafe { *((base + i * 4usize) as *const fn(i64) -> i64) };
    f(x)
}
